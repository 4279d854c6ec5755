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
}
