package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SketchesSpec extends SparkSpec {

  test("groupProfile estimates stay within sketch error of exact answers") {
    val e = Tables.events(spark, sfDir)
    val est = Sketches.groupProfile(e, "event_type", "user_id", "value")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = e.groupBy("event_type")
      .agg(countDistinct("user_id").as("d"),
        expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    exact.foreach { case (k, (d, m)) =>
      val (ed, em) = est(k)
      assert(math.abs(ed - d).toDouble / d < 0.05, s"$k distinct: $ed vs $d")
      assert(math.abs(em - m) <= math.max(1.0, 0.1 * math.abs(m)), s"$k median: $em vs $m")
    }
  }

  test("heavyHitters returns exactly the values at or above support") {
    val spark0 = spark
    import spark0.implicits._
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c"))
      .toDF("v")
    val hits = Sketches.heavyHitters(df, "v", 0.25)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hits == Map("a" -> 50L, "b" -> 30L))
  }

  test("cmsEstimate never underestimates and is exact for isolated keys") {
    val spark0 = spark
    import spark0.implicits._
    val keys = (1L to 200L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val df = keys.toDF("k")
    val depth = 4
    val width = 1024
    val sk = df.agg(org.apache.spark.sql.graft.CountMinAggFunctions
      .countMinSketch(col("k"), depth, width).as("sk"))
    val est = df.distinct().crossJoin(broadcast(sk))
      .select(col("k"),
        Sketches.cmsEstimate(col("sk"), col("k"), depth, width).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CMS must never underestimate: key $k est ${est(k)} < $n")
    }
    // at this load factor (200 keys / 1024 cells) most rows are clean:
    // the min over 4 rows should be exact for the large majority
    val exactCount = exact.count { case (k, n) => est(k) == n }
    assert(exactCount > 150, s"expected mostly exact estimates, got $exactCount/200")
  }

  test("heavyHittersCms equals the exact heavy hitters on real events") {
    val e = Tables.events(spark, sfDir).select("user_id")
    val exact = Sketches.heavyHitters(e, "user_id", 0.02)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cms = Sketches.heavyHittersCms(e, "user_id", 0.02)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cms == exact && exact.nonEmpty)
  }

  test("heavyHittersCms handles STRING keys identically to the exact form") {
    // regression: a cast-to-long key path nulls string keys out of the
    // sketch and silently returns empty; keys must enter via xxhash64
    val e = Tables.events(spark, sfDir).select("event_type")
    val exact = Sketches.heavyHitters(e, "event_type", 0.1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val cms = Sketches.heavyHittersCms(e, "event_type", 0.1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(cms == exact && exact.nonEmpty, s"cms=$cms exact=$exact")
  }

  test("count_min_sketch_flat rejects un-castable key types at analysis") {
    val spark0 = spark
    import spark0.implicits._
    graft.GraftSparkExtensions.register(spark)
    Seq((Array(1, 2), 1)).toDF("a", "n").createOrReplaceTempView("cms_bad_in")
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT count_min_sketch_flat(a, 4, 1024) FROM cms_bad_in").collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"), err.getMessage)
    // ...while integral widths narrower than long implicitly widen
    val ok = spark.sql(
      "SELECT count_min_sketch_flat(n, 4, 1024) FROM cms_bad_in").collect()
    assert(ok.length == 1)
  }
}
