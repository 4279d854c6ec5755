package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.execution.datasources.FileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileDataSourceV2
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 face of [[graft.sources.SnapshotStore]]:
  *
  * {{{
  *   spark.read.format("graft-snapshot")
  *     .option("root", "/data/snapshots")
  *     .option("table", "orders")
  *     .option("snapshot", "7")      // optional — default latest
  *     .load()
  * }}}
  *
  * The provider's only job is snapshot resolution: one manifest read maps
  * (root, table, snapshot?) to the committed data directory — the landing
  * dir or the newest compacted generation — and everything downstream is
  * the stock parquet DSv2 table on that path, so column pruning, filter
  * pushdown, row-group stats pruning and vectorized reading are exactly
  * the built-in scan's (`.explain` shows PushedFilters/ReadSchema as
  * usual). Mirrors the reference's readIcebergAtSnapshot surface
  * (glue/sbin/keyspaces/CQLReplicator.scala:1317-1331) with the manifest
  * supplying the snapshot-to-files mapping Iceberg metadata provides
  * there.
  *
  * Read-only by design: writes go through `SnapshotStore.write`, which
  * owns layout (sorted/bucketed) and the atomic manifest commit — a
  * DSv2 write path that bypassed the manifest would publish nothing.
  */
class SnapshotDataSource extends FileDataSourceV2 {

  override def fallbackFileFormat: Class[_ <: FileFormat] =
    classOf[ParquetFileFormat]

  override def shortName(): String = "graft-snapshot"

  private def resolve(options: CaseInsensitiveStringMap): Seq[String] = {
    val root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot requires the 'root' option (snapshot store root)"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException(
        "graft-snapshot requires the 'table' option"))
    val id = Option(options.get("snapshot")).map { s =>
      s.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"'snapshot' must be a snapshot id, got '$s'"))
    }
    Seq(graft.sources.SnapshotStore.dataDir(sparkSession, root, table, id))
  }

  override def getTable(options: CaseInsensitiveStringMap): Table = {
    val paths = resolve(options)
    ParquetTable(getTableName(options, paths), sparkSession,
      getOptionsWithoutPaths(options), paths, None, fallbackFileFormat)
  }

  override def getTable(options: CaseInsensitiveStringMap,
                        schema: StructType): Table = {
    val paths = resolve(options)
    ParquetTable(getTableName(options, paths), sparkSession,
      getOptionsWithoutPaths(options), paths, Some(schema), fallbackFileFormat)
  }
}
