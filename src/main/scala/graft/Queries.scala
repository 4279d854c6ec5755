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

  // ------------------------------------------------------------ transforms

  private val transforms: Seq[Q] = Seq(
    Q("transform_hash_md5",
      // Hash transform with alias, keepSource=true
      // (keyspaces/CQLReplicator.scala:879-924).
      (s, d) => Transforms.applyHashRules(
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
        Seq(Transforms.HashRule("o_orderpriority", "md5", "priority_hash", keepSource = true))),
      Some("""SELECT o_orderkey, o_orderpriority,
        |  md5(o_orderpriority) AS priority_hash FROM orders""".stripMargin)),

    Q("transform_hash_sha256",
      // keepSource=false: the source column is replaced by the alias.
      (s, d) => Transforms.applyHashRules(
        Tables.customer(s, d).select("c_custkey", "c_name"),
        Seq(Transforms.HashRule("c_name", "sha256", "name_hash"))),
      Some("SELECT c_custkey, sha256(c_name) AS name_hash FROM customer")),

    Q("transform_hash_xxhash64",
      // Production-grade 64-bit hash (native codegen'd xxhash64); DuckDB
      // has no compatible implementation, so this entry is rows-only and
      // the fixed-value check lives in TransformsSpec.
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        Transforms.hashColumn(col("o_orderpriority"), "xxhash64").as("priority_hash")),
      None),

    Q("filter_expression",
      // User-supplied SQL predicate applied before replication
      // (keyspaces/CQLReplicator.scala:1849-1852).
      (s, d) => Tables.orders(s, d)
        .filter("o_totalprice > 100000 AND o_orderstatus = 'F'")
        .select("o_orderkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 100000 AND o_orderstatus = 'F'""".stripMargin)),

    Q("field_mapping_cast",
      // OpenSearch fieldsMapping: rename + type cast in one projection
      // (opensearch/CQLReplicator.scala:84-88).
      (s, d) => Transforms.fieldMapping(Tables.orders(s, d), Seq(
        ("o_orderkey", "doc_key", "string"),
        ("o_orderdate", "order_day", "date"),
        ("o_custkey", "customer_id", "long"))),
      Some("""SELECT CAST(o_orderkey AS VARCHAR) AS doc_key,
        |  CAST(o_orderdate AS DATE) AS order_day,
        |  CAST(o_custkey AS BIGINT) AS customer_id FROM orders""".stripMargin)),

    Q("composite_key_concat",
      // DynamoDB pk#sk composite key (dynamodb/CQLReplicator.scala:465-467).
      (s, d) => Tables.lineitem(s, d).select(
        Transforms.compositeKey(Seq(col("l_orderkey"), col("l_linenumber"))).as("pk"),
        col("l_quantity")),
      Some("SELECT concat_ws('#', l_orderkey, l_linenumber) AS pk, l_quantity FROM lineitem")),

    Q("blob_to_hex",
      // CQL 0x-hex literal rendering of binary payloads
      // (keyspaces/CQLReplicator.scala:628-639); binary derived from text.
      (s, d) => Tables.customer(s, d).select(
        col("c_custkey"),
        Transforms.blobToHex(encode(col("c_name"), "UTF-8")).as("name_hex")),
      Some("SELECT c_custkey, '0x' || lower(hex(c_name)) AS name_hex FROM customer")),

    Q("json_field_extract",
      // JSON value extraction (UDT/JSON handling on the replication path).
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_value")),
      Some("""SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_value FROM events""".stripMargin)),

    Q("row_to_json",
      // INSERT JSON statement body (keyspaces/CQLReplicator.scala:815-852).
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        Transforms.rowToJson(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority")).as("doc")),
      Some("""SELECT o_orderkey,
        |  CAST(to_json(struct_pack(o_orderkey := o_orderkey,
        |    o_orderstatus := o_orderstatus,
        |    o_orderpriority := o_orderpriority)) AS VARCHAR) AS doc FROM orders""".stripMargin)),

    Q("counter_deltas",
      // Counter-column semantics: the target value is the sum of deltas per
      // key (keyspaces/CQLReplicator.scala:926-936). Decimal sum keeps the
      // result independent of partition merge order.
      (s, d) => Tables.events(s, d).groupBy(col("user_id"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).cast("double").as("counter_value"),
          count(lit(1)).as("n_updates")),
      Some("""SELECT user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS counter_value,
        |  COUNT(*) AS n_updates FROM events GROUP BY user_id""".stripMargin)),

    Q("ttl_filter",
      // TTL add-on predicate (parquet/CQLReplicator.scala:64): only rows
      // whose ttl exceeds the threshold replicate.
      (s, d) => Tables.documents(s, d)
        .filter(col("n_chars") > 300)
        .select(col("doc_id"), col("n_chars").as("ttl")),
      Some("SELECT doc_id, n_chars AS ttl FROM documents WHERE n_chars > 300")),

    Q("column_stats",
      // Column-stats sampler (keyspaces/CQLReplicator.scala:1683-1756) in
      // long format: one row per profiled column, single aggregation pass.
      (s, d) => Stats.columnStats(
        Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")),
      Some("""SELECT 'c_custkey' AS col_name, CAST(MIN(c_custkey) AS DOUBLE) AS min_v,
        |  CAST(SUM(CAST(c_custkey AS DECIMAL(38,6))) AS DOUBLE)/COUNT(c_custkey) AS avg_v,
        |  CAST(MAX(c_custkey) AS DOUBLE) AS max_v FROM customer
        |UNION ALL
        |SELECT 'c_name', CAST(MIN(LENGTH(c_name)) AS DOUBLE),
        |  CAST(SUM(CAST(LENGTH(c_name) AS DECIMAL(38,6))) AS DOUBLE)/COUNT(c_name),
        |  CAST(MAX(LENGTH(c_name)) AS DOUBLE) FROM customer
        |UNION ALL
        |SELECT 'c_acctbal', CAST(MIN(c_acctbal) AS DOUBLE),
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)/COUNT(c_acctbal),
        |  CAST(MAX(c_acctbal) AS DOUBLE) FROM customer
        |UNION ALL
        |SELECT 'c_mktsegment', CAST(MIN(LENGTH(c_mktsegment)) AS DOUBLE),
        |  CAST(SUM(CAST(LENGTH(c_mktsegment) AS DECIMAL(38,6))) AS DOUBLE)/COUNT(c_mktsegment),
        |  CAST(MAX(LENGTH(c_mktsegment)) AS DOUBLE) FROM customer""".stripMargin)),

    Q("replication_stats",
      // Per-tile insert/update/delete counts for a CDC cycle
      // (keyspaces/CQLReplicator.scala:1161-1215).
      (s, d) => {
        val o = Tables.orders(s, d)
        val prev = prevSnapshot(o)
        val curr = currSnapshot(o)
        def tiled(df: DataFrame) =
          df.withColumn("tile", Cdc.tileMd5(col("o_orderkey"), 4))
        Stats.replicationStats(
          tiled(Cdc.inserts(curr, prev, pk)),
          tiled(Cdc.updates(curr, prev, pk)),
          tiled(Cdc.deletes(curr, prev, pk)))
      },
      Some(s"""WITH prev AS ($prevSnapshotSql), curr AS ($currSnapshotSql),
        |changes AS (
        |  SELECT o_orderkey, 'insert' AS op FROM curr ANTI JOIN prev USING (o_orderkey)
        |  UNION ALL
        |  SELECT c.o_orderkey, 'update' AS op FROM curr c JOIN prev p USING (o_orderkey)
        |    WHERE c.ts IS DISTINCT FROM p.ts
        |  UNION ALL
        |  SELECT o_orderkey, 'delete' AS op FROM prev ANTI JOIN curr USING (o_orderkey))
        |SELECT (ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) * 256
        |   + ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1))) % 4 AS tile,
        |  op, COUNT(*) AS n
        |FROM changes GROUP BY 1, 2""".stripMargin)),

    Q("large_object_offload",
      // Wide-column offload with content-hash xref
      // (keyspaces/CQLReplicator.scala:682-725). Output = the narrow table
      // that replaces the original; payload side spec-tested.
      (s, d) => Transforms.offloadColumn(Tables.documents(s, d), "text")._1
        .select("doc_id", "lang", "source", "n_chars", "xref"),
      Some("""SELECT doc_id, lang, source, n_chars, md5("text") AS xref
        |FROM documents""".stripMargin)),

    Q("compress_columns",
      // Non-PK column packing (keyspaces/CQLReplicator.scala:727-757) with
      // DEFLATE; the oracle can't reproduce the codec bytes, so the query
      // proves the round-trip instead: inflate(deflate(text)) == text,
      // plus the original payload size.
      (s, d) => {
        val packed = Transforms.compressColumn(Tables.documents(s, d), "text", "packed")
        Transforms.decompressColumn(packed, "packed", "unpacked")
          .select(
            col("doc_id"),
            octet_length(col("text")).as("payload_bytes"),
            (col("unpacked") === col("text")).as("roundtrip_ok"))
      },
      Some("""SELECT doc_id, octet_length(encode("text")) AS payload_bytes,
        |  TRUE AS roundtrip_ok FROM documents""".stripMargin))
  )

  val all: Seq[Q] = coreCdc ++ transforms

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
