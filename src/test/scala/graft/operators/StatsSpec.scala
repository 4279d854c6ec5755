package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Profiling operators: fixed-bin histograms and z-score outliers. */
class StatsSpec extends SparkSpec {

  test("valueHistogram partitions every row into [0, bins-1]") {
    val spark0 = spark
    import spark0.implicits._
    val d = (0 until 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Stats.valueHistogram(d, "v", "grp", bins = 5)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // lo=0, hi=9, width=1.8: buckets 0..4, two values each
    assert(out === Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
  }

  test("valueHistogram caps the max value into the last bucket") {
    val spark0 = spark
    import spark0.implicits._
    val d = Seq(("g", 0.0), ("g", 10.0)).toDF("grp", "v")
    val out = Stats.valueHistogram(d, "v", "grp", bins = 4)
      .collect().map(r => r.getLong(1)).sorted
    assert(out.toSeq === Seq(0L, 3L))
  }

  test("valueHistogram degenerate lo==hi maps everything to bucket 0") {
    val spark0 = spark
    import spark0.implicits._
    val d = Seq(("g", 5.0), ("g", 5.0)).toDF("grp", "v")
    val out = Stats.valueHistogram(d, "v", "grp", bins = 8).collect()
    assert(out.length === 1 && out.head.getLong(1) === 0L &&
      out.head.getLong(2) === 2L)
  }

  test("zscoreOutliers flags exactly the injected outlier") {
    val spark0 = spark
    import spark0.implicits._
    val base = (1 to 40).map(i => (i.toLong, "t", 10.0 + (i % 2)))
    val d = (base :+ ((99L, "t", 1000.0))).toDF("event_id", "grp", "v")
    val out = Stats.zscoreOutliers(d, "v", "grp", z = 3.0)
      .select("event_id", "zscore").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(99L))
    val zs = out.head.getAs[Double]("zscore")
    assert(zs > 3.0)
  }

  test("madOutliers: robust to the very outliers it flags") {
    val spark0 = spark
    import spark0.implicits._
    // 1..9 plus two extreme values that would wreck a mean/sigma gate but
    // leave median/MAD nearly untouched (median 5; |v-5| sorted has
    // median 3)
    val d = ((1 to 9).map(i => ("t", i.toDouble)) ++
      Seq(("t", 1e6), ("t", -1e6))).toDF("grp", "v")
    val r = Stats.madOutliers(d, "v", "grp", k = 3.0).collect().head
    assert(r.getAs[Long]("n") === 11L)
    assert(r.getAs[Double]("median") === 5.0)
    assert(r.getAs[Double]("mad") === 3.0)
    // outliers: |v-5| > 3*1.4826*3 = 13.34 → the two extremes only
    assert(r.getAs[Long]("n_outliers") === 2L)
  }

  test("winsorize clamps into the exact percentile band") {
    val spark0 = spark
    import spark0.implicits._
    val d = (1 to 100).map(i => (i.toLong, "t", i.toDouble))
      .toDF("event_id", "grp", "v")
    val out = Stats.winsorize(d, "v", "grp", pLo = 0.05, pHi = 0.95)
      .select(col("event_id"), col("value_wins")).as[(Long, Double)]
      .collect().toMap
    // exact interpolated p05 of 1..100 = 5.95, p95 = 95.05
    assert(out(1L) === 5.95 && out(3L) === 5.95)
    assert(out(100L) === 95.05 && out(97L) === 95.05)
    assert(out(50L) === 50.0) // interior values untouched
  }

  test("keySkewReport reads a known skewed distribution") {
    val spark0 = spark
    import spark0.implicits._
    // 100 keys: key 0 has 901 rows, keys 1..99 have 1 each → top 1% (1 key)
    // holds 901/1000 of the data
    val d = ((1 to 901).map(_ => 0L) ++ (1L to 99L)).toDF("k")
    val r = Stats.keySkewReport(d, "k").collect().head
    assert(r.getAs[Long]("n_keys") === 100L)
    assert(r.getAs[Long]("n_rows") === 1000L)
    assert(r.getAs[Long]("max_size") === 901L)
    assert(r.getAs[Double]("p50_size") === 1.0)
    assert(r.getAs[Long]("top1pct_share_ppm") === 901000L)
  }
}
