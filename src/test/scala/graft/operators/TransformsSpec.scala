package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("hashColumn fixed values per rule") {
    val df = Seq("abc").toDF("v")
    def one(rule: String): Any =
      df.select(Transforms.hashColumn(col("v"), rule)).head().get(0)
    assert(one("md5") === "900150983cd24fb0d6963f7d28e17f72")
    assert(one("sha1") === "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one("sha256") === "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    // Spark-native 64-bit/32-bit hashes: pinned so the tiling contract
    // can't silently change across Spark upgrades.
    assert(one("xxhash64") === 1423657621850124518L)
    assert(one("murmur3") === 1322437556)
  }

  test("applyHashRules drops or keeps the source per rule") {
    val df = Seq((1L, "x")).toDF("id", "secret")
    val dropped = Transforms.applyHashRules(df,
      Seq(Transforms.HashRule("secret", "md5", "h")))
    assert(dropped.columns.toSet === Set("id", "h"))
    val kept = Transforms.applyHashRules(df,
      Seq(Transforms.HashRule("secret", "md5", "h", keepSource = true)))
    assert(kept.columns.toSet === Set("id", "secret", "h"))
  }

  test("deflate/inflate round-trips arbitrary text") {
    val texts = Seq("", "a", "hello world " * 1000, "héllo ünïcode 世界")
    texts.foreach { t =>
      val packed = Transforms.deflate(t.getBytes("UTF-8"))
      assert(new String(Transforms.inflate(packed), "UTF-8") === t)
    }
    // compression actually compresses repetitive payloads
    val big = "spark " * 10000
    assert(Transforms.deflate(big.getBytes("UTF-8")).length < big.length / 10)
  }

  test("offloadColumn splits payload and keeps a joinable xref") {
    val df = Seq((1L, "small", "WIDE" * 100), (2L, "tiny", "LOAD" * 100))
      .toDF("id", "meta", "payload")
    val (narrow, lob) = Transforms.offloadColumn(df, "payload")
    assert(narrow.columns.toSet === Set("id", "meta", "xref"))
    val rejoined = narrow.join(lob, "xref").select("id", "meta", "payload")
    assert(rejoined.count() === 2)
    assert(rejoined.filter(col("id") === 1L).select("payload").as[String].head()
      === "WIDE" * 100)
  }

  test("compositeKey matches the pk#sk contract") {
    val df = Seq((12L, 3)).toDF("pk", "sk")
    assert(df.select(Transforms.compositeKey(Seq(col("pk"), col("sk"))))
      .as[String].head() === "12#3")
  }

  test("cqlLiteral renders collection types with per-element quoting") {
    val df = Seq((Seq("it's", "b"), Seq(1, 2), Map("k" -> "v", "k2" -> "v'2")))
      .toDF("l", "s", "m")
    val row = df.select(
      Transforms.cqlLiteral(col("l"), "list<text>").as("l"),
      Transforms.cqlLiteral(col("s"), "frozen<set<int>>").as("s"),
      Transforms.cqlLiteral(col("m"), "map<text,text>").as("m")).head()
    assert(row.getString(0) === "['it''s','b']")
    assert(row.getString(1) === "{1,2}")
    assert(row.getString(2) === "{'k':'v', 'k2':'v''2'}")
  }

  test("cqlLiteral recurses into nested frozen collections") {
    val df = Seq(Tuple1(Map("a" -> Seq(1L, 2L)))).toDF("m")
    assert(df.select(Transforms.cqlLiteral(col("m"),
      "map<text, frozen<list<bigint>>>")).as[String].head()
      === "{'a':[1,2]}")
  }

  test("cqlDeleteStatement renders composite-pk WHERE with typed quoting") {
    val df = Seq((7L, "P'1")).toDF("k", "p")
    assert(df.select(Transforms.cqlDeleteStatement("ks.t", Seq(
      ("k", col("k"), "bigint"), ("p", col("p"), "text")))).as[String].head()
      === "DELETE FROM ks.t WHERE k=7 and p='P''1';")
  }

  test("cqlCounterUpdateStatement renders SET c=c+delta per counter") {
    val df = Seq((1L, 3L, -2L)).toDF("k", "a", "b")
    assert(df.select(Transforms.cqlCounterUpdateStatement("ks.c",
      Seq(("a", col("a")), ("b", col("b"))),
      Seq(("k", col("k"), "bigint")))).as[String].head()
      === "UPDATE ks.c SET a=a+3,b=b+-2 WHERE k=1;")
  }

  test("cqlBatches groups per tile in arrival order with bounded size") {
    val df = (1 to 10).map(i => (i % 2, i, s"S$i;")).toDF("tile", "ord", "stmt")
    val out = Transforms.cqlBatches(df, col("tile"), col("ord"), col("stmt"),
        maxPerBatch = 3)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(out((1, 0L)) ===
      ((3L, "BEGIN UNLOGGED BATCH S1; S3; S5; APPLY BATCH;")))
    assert(out((1, 1L)) ===
      ((2L, "BEGIN UNLOGGED BATCH S7; S9; APPLY BATCH;")))
    assert(out((0, 0L)) ===
      ((3L, "BEGIN UNLOGGED BATCH S2; S4; S6; APPLY BATCH;")))
    assert(out.values.map(_._1).sum === 10L)
  }

  test("cqlUsingClause: null TTL renders 0, non-positive TIMESTAMP omitted") {
    val df = Seq((Option.empty[Long], 0L), (Some(5L), 42L)).toDF("ttl", "wt")
    val rows = df.select(
      Transforms.cqlUsingClause(Some(col("ttl")), Some(col("wt"))).as("both"),
      Transforms.cqlUsingClause(None, Some(col("wt"))).as("ts_only"),
      Transforms.cqlUsingClause(None, None).as("none"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) === ((" USING TTL 0", "", "")))
    assert(rows(1) === ((" USING TTL 5 AND TIMESTAMP 42", " USING TIMESTAMP 42", "")))
  }

  test("cqlInsertJsonStatement: escaping, suffix branches, reference spacing") {
    val df = Seq(
      ("""{"k":1,"v":"it's"}""", Some(42L), Some(7L)),
      ("""{"k":2}""", Some(0L), Option.empty[Long]))
      .toDF("doc", "wt", "ttl")
    val rows = df.select(
      Transforms.cqlInsertJsonStatement("ks.t", col("doc"),
        usingTimestamp = Some(col("wt"))).as("ts_form"),
      Transforms.cqlInsertJsonStatement("ks.t", col("doc"),
        usingTtl = Some(col("ttl")), ifNotExists = true).as("ttl_cas_form"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // '' escaping of the whole document (keyspaces:839); positive ts renders
    assert(rows(0)._1 ===
      """INSERT INTO ks.t JSON '{"k":1,"v":"it''s"}' USING TIMESTAMP 42""")
    assert(rows(0)._2 ===
      """INSERT INTO ks.t JSON '{"k":1,"v":"it''s"}' IF NOT EXISTS USING TTL 7""")
    // ts=0 suppressed but the reference's pre-suffix space stays (:1013);
    // null TTL falls back to 0 (:1039-1044)
    assert(rows(1)._1 === """INSERT INTO ks.t JSON '{"k":2}' """)
    assert(rows(1)._2 ===
      """INSERT INTO ks.t JSON '{"k":2}' IF NOT EXISTS USING TTL 0""")
    // the reference renders either the TTL or the TIMESTAMP form, never both
    intercept[IllegalArgumentException] {
      Transforms.cqlInsertJsonStatement("ks.t", col("doc"),
        usingTtl = Some(col("ttl")), usingTimestamp = Some(col("wt")))
    }
  }

  test("cqlLiteral: tuples positional, UDTs by name, frozen transparent at depth") {
    val df = Seq((1L, "a'b", BigDecimal("12.34"))).toDF("k", "s", "p")
    val row = df.select(
      Transforms.cqlLiteral(struct(col("k"), col("s")),
        "frozen<tuple<bigint, text>>").as("t"),
      Transforms.cqlLiteral(struct(
          col("s").as("street"),
          struct(col("p"), col("k")).as("geo"),
          array(col("s")).as("tags")),
        "udt<street:text, geo:frozen<tuple<decimal, bigint>>, tags:frozen<list<text>>>").as("u"),
      // a tuple inside a list: the positional accessor must work on
      // lambda-bound elements, not just top-level columns
      Transforms.cqlLiteral(array(struct(col("k"), col("s"))),
        "list<frozen<tuple<bigint, text>>>").as("lt")).head()
    assert(row.getString(0) === "(1,'a''b')")
    assert(row.getString(1) === "{street:'a''b', geo:(12.34,1), tags:['a''b']}")
    assert(row.getString(2) === "[(1,'a''b')]")
  }

  test("cqlTypeToSparkSqlType matches the reference map, unknown -> STRING") {
    val pairs = Seq("text" -> "STRING", "inet" -> "STRING", "varint" -> "INT",
      "counter" -> "BIGINT", "decimal" -> "DECIMAL(38,19)",
      "blob" -> "BINARY", "TimeUUID" -> "STRING", "duration" -> "STRING")
    val out = pairs.map(_._1).toDF("t")
      .select(col("t"), Transforms.cqlTypeToSparkSqlType(col("t")).as("m"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    pairs.foreach { case (t, exp) => assert(out(t) === exp, t) }
  }
}
