package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Versioned snapshot store over plain parquet — the Spark-first
  * re-expression of the reference's Iceberg tile-snapshot lifecycle
  * (glue/sbin/keyspaces/CQLReplicator.scala:1249-1462:
  * ensureIcebergTableExists / writeIcebergTileSnapshot /
  * readIcebergAtSnapshot / computeIcebergChanges / getSnapshotIds /
  * expireIcebergSnapshots / migrateParquetToIceberg).
  *
  * Layout: `root/table/snap=<id>/…parquet`, one directory per immutable
  * snapshot id. No table format dependency: snapshot listing is a single
  * filesystem LIST (any HDFS-compatible store), reads are ordinary
  * pruned parquet scans, and CDC between two ids is the declarative
  * [[Cdc]] diff — so every operation scales exactly like its underlying
  * Spark primitive. Writers can pass `buckets > 0` to lay each snapshot
  * out bucketed by PK ([[ParquetSink.writeBucketedSnapshot]] semantics),
  * making the diff between equally-bucketed snapshots shuffle-free at
  * 100 TB.
  */
object SnapshotStore {

  private def tableDir(root: String, table: String) = s"$root/$table"
  private def snapDir(root: String, table: String, id: Long) =
    s"${tableDir(root, table)}/snap=$id"

  /** Writes an immutable snapshot `id` of `df`. Fails if the id exists
    * (snapshots are append-only; use [[expire]] for retention).
    */
  def write(df: DataFrame, root: String, table: String, id: Long): Unit = {
    require(!exists(df.sparkSession, root, table, id),
      s"snapshot $id of $table already exists (snapshots are immutable)")
    df.write.mode("errorifexists").parquet(snapDir(root, table, id))
  }

  /** All snapshot ids of `table`, ascending — one filesystem LIST. */
  def snapshotIds(spark: SparkSession, root: String, table: String): Seq[Long] = {
    val dir = new Path(tableDir(root, table))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("snap=") => s.stripPrefix("snap=").toLong }
      .sorted
  }

  def exists(spark: SparkSession, root: String, table: String, id: Long): Boolean =
    snapshotIds(spark, root, table).contains(id)

  def latestId(spark: SparkSession, root: String, table: String): Option[Long] =
    snapshotIds(spark, root, table).lastOption

  /** Reads snapshot `id` — an ordinary parquet scan (column pruning +
    * predicate pushdown apply as usual).
    */
  def read(spark: SparkSession, root: String, table: String, id: Long): DataFrame =
    spark.read.parquet(snapDir(root, table, id))

  def readLatest(spark: SparkSession, root: String, table: String): DataFrame = {
    val id = latestId(spark, root, table).getOrElse(
      throw new IllegalArgumentException(s"no snapshots of $table under $root"))
    read(spark, root, table, id)
  }

  /** CDC between two snapshot ids as one change relation with an `op`
    * column: I = inserted key (row from `to`), D = deleted key (row from
    * `from`), U = updated key (row from `to`, null-safe ts inequality) —
    * the reference's computeIcebergChanges triple as a single declarative
    * union of three PK joins.
    */
  def changes(spark: SparkSession, root: String, table: String,
              fromId: Long, toId: Long,
              pkCols: Seq[String], tsCol: String = "ts"): DataFrame = {
    val prev = read(spark, root, table, fromId)
    val curr = read(spark, root, table, toId)
    changesBetween(curr, prev, pkCols, tsCol)
  }

  /** The change relation for two already-loaded snapshots (exposed so
    * callers with bucketed/cached snapshots skip the re-read).
    */
  def changesBetween(curr: DataFrame, prev: DataFrame,
                     pkCols: Seq[String], tsCol: String = "ts"): DataFrame =
    Cdc.inserts(curr, prev, pkCols).withColumn("op", lit("I"))
      .unionByName(Cdc.deletes(curr, prev, pkCols).withColumn("op", lit("D")))
      .unionByName(Cdc.updates(curr, prev, pkCols, tsCol).withColumn("op", lit("U")))

  /** Deletes every snapshot except the newest `keepLast` (the reference's
    * expireIcebergSnapshots retention contract). Returns expired ids.
    */
  def expire(spark: SparkSession, root: String, table: String,
             keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val ids = snapshotIds(spark, root, table)
    val drop = ids.dropRight(keepLast)
    val fs = new Path(tableDir(root, table))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach(id => fs.delete(new Path(snapDir(root, table, id)), true))
    drop
  }

  /** Adopts a legacy un-versioned parquet dataset as snapshot `id`
    * (default 0) — the migrateParquetToIceberg shape: one read, one
    * snapshot write, the legacy data is left untouched.
    */
  def migrateLegacy(spark: SparkSession, legacyPath: String,
                    root: String, table: String, id: Long = 0L): Unit =
    write(spark.read.parquet(legacyPath), root, table, id)
}
