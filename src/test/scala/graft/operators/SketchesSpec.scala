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
}
