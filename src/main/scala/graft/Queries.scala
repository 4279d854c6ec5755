package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators._

/** The operator inventory of SURVEY.md §2 wired into named, oracle-checked
  * queries. Each entry pairs a Spark plan with (where expressible) an ANSI
  * SQL equivalent the driver runs in DuckDB over the same parquet tables.
  *
  * Determinism rules (SURVEY §5): double arithmetic only row-wise, sums
  * over decimal (order-independent), explicit tie-breaks, identical column
  * aliases on both sides.
  */
object Queries {

  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  // ---------------------------------------------------------------- helpers

  /** Simulated "previous" snapshot of the orders table: pk + writetime-like
    * ts. Some keys absent (inserted later), some ts null (column never
    * written — exercises the null-safe update compare, reference
    * keyspaces/CQLReplicator.scala:1369-1381).
    */
  private[graft] def prevSnapshot(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 10 =!= 3)
      .select(
        col("o_orderkey"),
        when(col("o_orderkey") % 11 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey") * 1000 + col("o_orderkey") % 7)
          .as("ts"))

  private[graft] val prevSnapshotSql: String =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 11 = 0 THEN NULL
      |       ELSE o_custkey * 1000 + o_orderkey % 7 END AS ts
      |FROM orders WHERE o_orderkey % 10 <> 3""".stripMargin

  /** Simulated "current" snapshot: some prev keys gone (deletes), new keys
    * present (inserts), ts bumped for a subset (updates), nulls resolved.
    */
  private[graft] def currSnapshot(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 7 =!= 2)
      .select(
        col("o_orderkey"),
        (col("o_custkey") * 1000 + col("o_orderkey") % 7 +
          when(col("o_orderkey") % 5 === 0, 1).otherwise(0)).as("ts"))

  private[graft] val currSnapshotSql: String =
    """SELECT o_orderkey,
      |  o_custkey * 1000 + o_orderkey % 7 +
      |    CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS ts
      |FROM orders WHERE o_orderkey % 7 <> 2""".stripMargin

  /** Simulated replication target key set: most source keys plus a few the
    * source never had (exercises both reconcile directions).
    */
  private[graft] def targetKeys(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 13 =!= 5).select(col("o_orderkey"))
      .unionByName(
        orders.filter(col("o_orderkey") % 17 === 0)
          .select((col("o_orderkey") + 10000000L).as("o_orderkey")))

  private[graft] val targetKeysSql: String =
    """SELECT o_orderkey FROM orders WHERE o_orderkey % 13 <> 5
      |UNION ALL
      |SELECT o_orderkey + 10000000 AS o_orderkey FROM orders WHERE o_orderkey % 17 = 0""".stripMargin

  private val pk = Seq("o_orderkey")

  // ------------------------------------------------------------ core + CDC

  private val coreCdc: Seq[Q] = Seq(
    Q("q1_pricing_agg",
      (s, d) => {
        val l = Tables.lineitem(s, d)
        l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity").cast(DecimalType(38, 4))).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(DecimalType(38, 4))).cast("double").as("sum_base_price"),
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(DecimalType(38, 6))).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    Q("source_scan_project",
      // PK + selected non-PK column projection with a filter, the
      // discovery-scan shape (keyspaces/CQLReplicator.scala:1799-1830).
      // Declarative select+filter so parquet gets both column pruning and
      // predicate pushdown.
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),

    Q("writetime_greatest",
      // ts := greatest(writetime(c1)..writetime(cN))
      // (keyspaces/CQLReplicator.scala:381-384); writetimes emulated by
      // deterministic per-column integers.
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        greatest(
          col("o_custkey") * 7 % 1000,
          col("o_orderkey") * 3 % 1000,
          col("o_orderkey") % 11 * 90).as("ts")),
      Some("""SELECT o_orderkey,
        |  GREATEST(o_custkey * 7 % 1000, o_orderkey * 3 % 1000, o_orderkey % 11 * 90) AS ts
        |FROM orders""".stripMargin)),

    Q("point_in_time_filter",
      // Point-in-time replication predicate on the writetime column
      // (keyspaces/CQLReplicator.scala:1789-1797): ts IS NOT NULL AND ts > PIT.
      (s, d) => prevSnapshot(Tables.orders(s, d))
        .filter(col("ts").isNotNull && col("ts") > lit(500000L)),
      Some(s"""SELECT * FROM ($prevSnapshotSql)
        |WHERE ts IS NOT NULL AND ts > 500000""".stripMargin)),

    Q("tile_assign",
      // Hash tiling (keyspaces/CQLReplicator.scala:1832-1843), portable-md5
      // variant so the oracle can recompute it; the xxhash64 production
      // variant is spec-tested (TilingSpec).
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), Cdc.tileMd5(col("o_orderkey"), 8).as("tile")),
      Some("""SELECT o_orderkey,
        |  (ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 256
        |   + ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 8 AS tile
        |FROM orders""".stripMargin)),

    Q("tile_counts",
      // Discovery stats: primary keys per tile
      // (keyspaces/CQLReplicator.scala:2282-2284).
      (s, d) => Tables.orders(s, d)
        .select(Cdc.tileMd5(col("o_orderkey"), 8).as("tile"))
        .groupBy("tile").agg(count(lit(1)).as("n_keys")),
      Some("""SELECT (ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 256
        |   + ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 8 AS tile,
        |  COUNT(*) AS n_keys
        |FROM orders GROUP BY 1""".stripMargin)),

    Q("snapshot_diff_inserts",
      (s, d) => {
        val o = Tables.orders(s, d)
        Cdc.inserts(currSnapshot(o), prevSnapshot(o), pk)
      },
      Some(s"""SELECT c.* FROM ($currSnapshotSql) c
        |ANTI JOIN ($prevSnapshotSql) p USING (o_orderkey)""".stripMargin)),

    Q("snapshot_diff_deletes",
      (s, d) => {
        val o = Tables.orders(s, d)
        Cdc.deletes(currSnapshot(o), prevSnapshot(o), pk)
      },
      Some(s"""SELECT p.* FROM ($prevSnapshotSql) p
        |ANTI JOIN ($currSnapshotSql) c USING (o_orderkey)""".stripMargin)),

    Q("snapshot_diff_updates",
      (s, d) => {
        val o = Tables.orders(s, d)
        Cdc.updates(currSnapshot(o), prevSnapshot(o), pk)
      },
      Some(s"""SELECT c.o_orderkey, c.ts FROM ($currSnapshotSql) c
        |JOIN ($prevSnapshotSql) p USING (o_orderkey)
        |WHERE c.ts IS DISTINCT FROM p.ts""".stripMargin)),

    Q("delta_merge_apply",
      // Reconstructs curr from prev + the change set; oracle is the curr
      // snapshot itself, proving diff+apply round-trips exactly.
      (s, d) => {
        val o = Tables.orders(s, d)
        val prev = prevSnapshot(o)
        val curr = currSnapshot(o)
        Cdc.applyDelta(
          prev,
          Cdc.inserts(curr, prev, pk),
          Cdc.updates(curr, prev, pk),
          Cdc.deletes(curr, prev, pk),
          pk)
      },
      Some(currSnapshotSql)),

    Q("pk_reconcile_missing",
      (s, d) => {
        val o = Tables.orders(s, d)
        Cdc.reconcileMissing(o.select("o_orderkey"), targetKeys(o), pk)
      },
      Some(s"""SELECT DISTINCT o_orderkey FROM orders
        |ANTI JOIN ($targetKeysSql) t USING (o_orderkey)""".stripMargin)),

    Q("pk_reconcile_extra",
      (s, d) => {
        val o = Tables.orders(s, d)
        Cdc.reconcileExtra(o.select("o_orderkey"), targetKeys(o), pk)
      },
      Some(s"""SELECT DISTINCT t.o_orderkey FROM ($targetKeysSql) t
        |ANTI JOIN orders USING (o_orderkey)""".stripMargin)),

    Q("pk_reconcile_common",
      (s, d) => {
        val o = Tables.orders(s, d)
        Cdc.reconcileCommon(o.select("o_orderkey"), targetKeys(o), pk)
      },
      Some(s"""SELECT DISTINCT o.o_orderkey FROM orders o
        |SEMI JOIN ($targetKeysSql) t ON o.o_orderkey = t.o_orderkey""".stripMargin))
  )

  val all: Seq[Q] = coreCdc

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
