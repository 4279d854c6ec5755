package graft

import graft.SparkSpec

class GraftSparkExtensionsSpec extends SparkSpec {

  test("float_vec_cosine is callable from SQL after registration") {
    GraftSparkExtensions.register(spark)
    val r = spark.sql(
      """SELECT float_vec_cosine(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("minhash aggregates are callable from SQL after registration") {
    GraftSparkExtensions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("doc_id", "h")
      .createOrReplaceTempView("sh")
    val sig = spark.sql(
      "SELECT doc_id, minhash_sig(h, 8) AS sig FROM sh GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig(1L).length == 8 && sig(2L).length == 8)
    // doc 2's shingles are a subset of doc 1's -> every minimum <=
    assert(sig(1L).zip(sig(2L)).forall { case (a, b) => a <= b })
    val bk = spark.sql(
      "SELECT doc_id, minhash_band_keys(h, 8, 4) AS bk FROM sh GROUP BY doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bk(1L).length == 4)
    // SQL form matches the Column-API form
    import org.apache.spark.sql.functions.col
    val viaCols = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("doc_id", "h")
      .groupBy("doc_id")
      .agg(graft.functions.minhashBandKeys(col("h"), 8, 4).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bk.view.mapValues(_.toSeq).toMap == viaCols.view.mapValues(_.toSeq).toMap)
  }

  test("simhash_fp and srp_sign are callable from SQL after registration") {
    GraftSparkExtensions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
      .createOrReplaceTempView("sdocs")
    val fp = spark.sql(
      """SELECT doc_id, simhash_fp(xxhash64(tok)) AS fp
        |FROM (SELECT doc_id, explode(split(text, ' ')) AS tok FROM sdocs)
        |GROUP BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    // matches the operator form
    val viaOp = graft.operators.TextDedup.simhash(
      Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp == viaOp)
    val srp = spark.sql(
      """SELECT srp_sign(array(CAST(1.0 AS FLOAT), CAST(-2.5 AS FLOAT))) AS s,
        |       srp_sign(array(CAST(1.0 AS FLOAT), CAST(-2.5 AS FLOAT))) AS s2""".stripMargin)
      .head()
    assert(srp.getLong(0) == srp.getLong(1)) // deterministic
  }

  test("float_vec_l2sq and count_min_sketch_flat are callable from SQL") {
    GraftSparkExtensions.register(spark)
    val d = spark.sql(
      """SELECT float_vec_l2sq(
        |  array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |  array(CAST(4.0 AS FLOAT), CAST(6.0 AS FLOAT))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(d == 25.0) // 3^2 + 4^2
    val spark0 = spark
    import spark0.implicits._
    Seq(7L, 7L, 9L).toDF("k").createOrReplaceTempView("cms_in")
    // estimate formula against the SQL-built sketch: key 7 appears twice
    val est = spark.sql(
      """WITH sk AS (SELECT count_min_sketch_flat(k, 4, 64) AS s FROM cms_in)
        |SELECT least(
        |  element_at(s, CAST(0*64 + pmod(xxhash64(CAST(7 AS BIGINT), 0), 64) + 1 AS INT)),
        |  element_at(s, CAST(1*64 + pmod(xxhash64(CAST(7 AS BIGINT), 1), 64) + 1 AS INT)),
        |  element_at(s, CAST(2*64 + pmod(xxhash64(CAST(7 AS BIGINT), 2), 64) + 1 AS INT)),
        |  element_at(s, CAST(3*64 + pmod(xxhash64(CAST(7 AS BIGINT), 3), 64) + 1 AS INT))) AS est
        |FROM sk""".stripMargin).head().getLong(0)
    assert(est >= 2L && est <= 3L)
  }

  test("hash_bucket in SQL equals Sampling.hashBucket and the seed is stable") {
    GraftSparkExtensions.register(spark)
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 50L).toDF("k")
    df.createOrReplaceTempView("hb_keys")
    val viaSql = spark.sql("SELECT k, hash_bucket(k) AS b FROM hb_keys")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val k = org.apache.spark.sql.functions.col("k")
    val viaOp = df.select(k,
        graft.operators.Sampling.hashBucket(k).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == viaOp)
    assert(viaSql.values.forall(b => b >= 0 && b < 65536))
    // pinned value: md5('7') = 8f14...; '8f14' hex = 36628
    assert(viaSql(7L) == 36628)
  }

  test("extensions class injects on a fresh session builder") {
    // the class itself must be instantiable by spark.sql.extensions
    val ext = new GraftSparkExtensions
    val holder = new org.apache.spark.sql.SparkSessionExtensions
    ext(holder) // must not throw
    assert(GraftSparkExtensions.functions.nonEmpty)
  }
}
