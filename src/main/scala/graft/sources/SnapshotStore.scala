package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
    * `sortCols` lays the snapshot out range-partitioned + sorted
    * ([[ParquetSink.writeSorted]]) so selective reads — point-in-time
    * filters, PK probes — prune row groups via parquet min/max stats.
    */
  def write(df: DataFrame, root: String, table: String, id: Long,
            sortCols: Seq[String] = Nil): Unit = {
    require(!exists(df.sparkSession, root, table, id),
      s"snapshot $id of $table already exists (snapshots are immutable)")
    if (sortCols.isEmpty)
      df.write.mode("errorifexists").parquet(snapDir(root, table, id))
    else
      ParquetSink.writeSorted(df, snapDir(root, table, id), sortCols,
        mode = org.apache.spark.sql.SaveMode.ErrorIfExists)
  }

  /** All snapshot ids of `table`, ascending — one filesystem LIST. */
  def snapshotIds(spark: SparkSession, root: String, table: String): Seq[Long] = {
    val dir = new Path(tableDir(root, table))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      // tolerate foreign dirs (maintenance staging, manual debris): only a
      // parseable snap=<long> is a snapshot
      .collect { case s if s.startsWith("snap=") => s.stripPrefix("snap=") }
      .flatMap(_.toLongOption)
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

  /** Compacts snapshot `id` in place to ~`targetFileBytes` files (the
    * small-file problem of frequent snapshots; the reference's
    * writeWithSizeControl applied as maintenance). Rewrite-then-swap: the
    * sized copy lands in a staging dir OUTSIDE the `snap=` namespace (so
    * listings and the streaming feed never see it), then replaces the
    * snapshot with two renames. The swap leaves a brief window where the
    * path is absent — a concurrent reader should retry; true
    * metadata-pointer atomicity is a table-format concern, not a
    * plain-directory one. A failed second rename rolls the original back.
    * Returns the file count after compaction.
    */
  def compact(spark: SparkSession, root: String, table: String, id: Long,
              targetFileBytes: Long = 128L << 20): Int = {
    require(exists(spark, root, table, id), s"snapshot $id of $table not found")
    val dir = new Path(snapDir(root, table, id))
    val staging = new Path(s"${tableDir(root, table)}/.compact-staging-$id")
    val old = new Path(s"${tableDir(root, table)}/.compact-old-$id")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true); fs.delete(old, true) // stale maintenance debris
    ParquetSink.writeSizeControlled(
      spark.read.parquet(dir.toString), staging.toString, targetFileBytes)
    require(fs.rename(dir, old), s"compaction swap failed for $dir")
    if (!fs.rename(staging, dir)) {
      fs.rename(old, dir) // roll the original back before failing
      throw new IllegalStateException(s"compaction swap failed for $staging")
    }
    fs.delete(old, true)
    fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet"))
  }

  // ------------------------------------------------------ streaming feed

  /** One landed snapshot row in the streaming feed: `snap` is the
    * partition-directory id the row arrived under. Public: the state
    * serializer codegen requires a public class.
    */
  final case class SnapRow(pk: Long, ts: java.lang.Long, snap: Long)

  /** One change emitted by the feed: op = I (first sighting of the key)
    * or U (null-safe ts change). `snap` is the snapshot that introduced
    * the change.
    */
  final case class ChangeOut(pk: Long, op: String, ts: java.lang.Long,
                             snap: Long)

  /** Keyed state of the feed: the last seen ts, with null (column never
    * written) carried as an explicit flag — a sentinel value would
    * conflate a legal ts with null and suppress a null-safe U. Public:
    * the state serializer codegen requires a public class.
    */
  final case class TsState(ts: Long, isNull: Boolean)

  /** Streaming upsert feed over the store: snapshots landing under
    * `root/table/snap=<id>/` become a file stream, and per-PK keyed state
    * (flatMapGroupsWithState) turns row arrivals into I/U changes — the
    * continuous form of [[changes]], with the ledger's "what did I last
    * replicate for this key" as checkpointed state instead of a control
    * table (the reference's discovery loop, keyspaces:1161-1215).
    *
    * Deletes are intentionally absent: detecting absence requires a
    * snapshot-boundary barrier, which is the batch [[changes]] contract
    * (same split as the reference: delete propagation is its own pass).
    * Rows inside one micro-batch are folded in snapshot order, so a
    * trigger that catches up over several snapshots emits the same net
    * I/U set the pairwise batch diffs would.
    */
  def upsertFeed(spark: SparkSession, root: String, table: String,
                 pkCol: String, tsCol: String = "ts"): Dataset[ChangeOut] = {
    import spark.implicits._
    val schema = readLatest(spark, root, table).schema
      .add("snap", org.apache.spark.sql.types.LongType)
    val rows = spark.readStream
      .schema(schema)
      .option("basePath", tableDir(root, table))
      .parquet(s"${tableDir(root, table)}/snap=*")
      .select(col(pkCol).cast("long").as("pk"),
        col(tsCol).cast("long").as("ts"), col("snap"))
      .as[SnapRow]
    rows.groupByKey(_.pk)
      .flatMapGroupsWithState[TsState, ChangeOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (pk, it, state: org.apache.spark.sql.streaming.GroupState[TsState]) =>
          val arrivals = it.toSeq.sortBy(_.snap)
          val out = scala.collection.mutable.ArrayBuffer.empty[ChangeOut]
          var seen = state.exists
          var last: TsState = state.getOption.getOrElse(TsState(0L, isNull = true))
          arrivals.foreach { r =>
            val cur = TsState(if (r.ts == null) 0L else r.ts, r.ts == null)
            if (!seen) { out += ChangeOut(pk, "I", r.ts, r.snap); seen = true }
            else if (last != cur)
              out += ChangeOut(pk, "U", r.ts, r.snap)
            last = cur
          }
          state.update(last)
          out.iterator
      }
  }
}
