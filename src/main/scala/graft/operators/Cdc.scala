package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture core: snapshot diffing, tiling, key reconciliation.
  *
  * Re-expresses the reference's CDC semantics
  * (glue/sbin/keyspaces/CQLReplicator.scala:1355-1384 — computeIcebergChanges;
  * :1832-1843 — tile grouping;
  * glue/sbin/keyspaces/PrimaryKeyReconciliation.scala:645-670 — DiffEngine)
  * as declarative Spark plans. The reference drives per-tile loops over
  * Iceberg snapshots; here a snapshot is any DataFrame of
  * `pk columns + ts` and the diff is a pair of shuffle joins that Catalyst
  * plans (sort-merge on the PK hash, AQE-skew-aware, broadcast if one side
  * is small). At 100 TB, persist snapshots bucketed by PK to make these
  * diffs shuffle-free.
  */
object Cdc {

  /** Row writetime from an arbitrary user-configured column list, the
    * buildWritetimeExpression contract (keyspaces/CQLReplicator.scala:
    * 381-384): one column stands alone, several fold into `greatest`,
    * either way aliased `ts`. Callers pass whatever per-column writetime
    * expressions their source exposes.
    */
  def writetimeExpression(columns: Seq[Column]): Column = {
    require(columns.nonEmpty, "at least one writetime column required")
    (columns match {
      case Seq(single) => single
      case multiple    => greatest(multiple: _*)
    }).as("ts")
  }

  /** New keys: in `curr` but not in `prev` (reference :1366). */
  def inserts(curr: DataFrame, prev: DataFrame, pkCols: Seq[String]): DataFrame =
    curr.join(prev, pkCols, "left_anti")

  /** Dropped keys: in `prev` but not in `curr` (reference :1367). */
  def deletes(curr: DataFrame, prev: DataFrame, pkCols: Seq[String]): DataFrame =
    prev.join(curr, pkCols, "left_anti")

  /** Keys present in both whose `ts` changed. Null-safe comparison: a
    * writetime that transitions null -> value (or back) is an update
    * (reference :1369-1381 uses NOT (curr.ts <=> prev.ts) for the same
    * reason).
    */
  def updates(curr: DataFrame, prev: DataFrame, pkCols: Seq[String],
              tsCol: String = "ts"): DataFrame = {
    val c = curr.alias("curr")
    val p = prev.alias("prev")
    val joinCond = pkCols.map(k => col(s"curr.$k") === col(s"prev.$k")).reduce(_ && _)
    // Full curr row out (not just pk+ts): inserts/deletes carry full rows,
    // so a diff union — SnapshotStore.changesBetween — stays well-typed
    // for tables with payload columns beyond the key and timestamp.
    c.join(p, joinCond, "inner")
      .filter(!(col(s"curr.$tsCol") <=> col(s"prev.$tsCol")))
      .select(curr.columns.map(k => col(s"curr.$k")).toSeq: _*)
  }

  /** Applies a change set to a snapshot: next = prev - deletes - (keys of
    * updates) + inserts + updates. With a correct diff this reconstructs
    * `curr` exactly — the property the spec and oracle verify.
    */
  def applyDelta(prev: DataFrame, ins: DataFrame, upd: DataFrame,
                 del: DataFrame, pkCols: Seq[String]): DataFrame = {
    val touched = upd.select(pkCols.map(col): _*)
      .union(del.select(pkCols.map(col): _*))
    prev.join(touched, pkCols, "left_anti")
      .unionByName(ins)
      .unionByName(upd)
  }

  /** Deterministic tile id from the primary key, the reference's work-unit
    * assignment (:1832-1843 — abs(xxhash64(concat(pk))) % totalTiles).
    * In Spark the tile is just a column; `repartition(n, tile)` reproduces
    * the reference's physical grouping when needed, but most consumers
    * should rely on the natural shuffle partitioning instead.
    */
  def tileXxhash64(pkCols: Seq[Column], totalTiles: Int): Column =
    pmod(abs(xxhash64(pkCols.map(_.cast("string")): _*)), lit(totalTiles))

  /** Portable variant of [[tileXxhash64]] built on md5, reproducible in any
    * engine (used by the cross-engine correctness oracle; same contract,
    * different mixer). Two hex chars -> 16 bits of hash -> modulo.
    */
  def tileMd5(pk: Column, totalTiles: Int): Column = {
    val h = md5(pk.cast("string"))
    pmod(ascii(substring(h, 1, 1)) * 256 + ascii(substring(h, 2, 1)), lit(totalTiles))
  }

  /** Distinct keys in `source` missing from `target`
    * (PrimaryKeyReconciliation.scala:651 antiJoinDistinct).
    */
  def reconcileMissing(source: DataFrame, target: DataFrame, pkCols: Seq[String]): DataFrame =
    source.select(pkCols.map(col): _*).distinct()
      .join(target.select(pkCols.map(col): _*).distinct(), pkCols, "left_anti")

  /** Distinct keys in `target` that the `source` never had. */
  def reconcileExtra(source: DataFrame, target: DataFrame, pkCols: Seq[String]): DataFrame =
    reconcileMissing(target, source, pkCols)

  /** Distinct keys present on both sides
    * (PrimaryKeyReconciliation.scala:660 intersectionDistinct).
    */
  def reconcileCommon(source: DataFrame, target: DataFrame, pkCols: Seq[String]): DataFrame =
    source.select(pkCols.map(col): _*).distinct()
      .join(target.select(pkCols.map(col): _*).distinct(), pkCols, "left_semi")
}
