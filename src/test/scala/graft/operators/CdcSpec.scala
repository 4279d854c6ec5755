package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, java.lang.Long)*) =
    rows.toDF("id", "ts")

  test("writetimeExpression: single column stands alone, several fold into greatest") {
    val df = Seq((5L, 9L, 2L)).toDF("a", "b", "c")
    val single = df.select(Cdc.writetimeExpression(Seq(col("a"))))
    assert(single.columns.toSeq === Seq("ts"))
    assert(single.as[Long].head() === 5L)
    val multi = df.select(Cdc.writetimeExpression(Seq(col("a"), col("b"), col("c"))))
    assert(multi.columns.toSeq === Seq("ts"))
    assert(multi.as[Long].head() === 9L)
    intercept[IllegalArgumentException](Cdc.writetimeExpression(Seq.empty))
  }

  test("inserts/deletes/updates partition the change space") {
    val prev = snap(1L -> 10L, 2L -> 20L, 3L -> null, 4L -> 40L)
    val curr = snap(1L -> 10L, 2L -> 21L, 3L -> 30L, 5L -> 50L)
    assert(Cdc.inserts(curr, prev, Seq("id")).select("id").as[Long].collect().sorted
      === Array(5L))
    assert(Cdc.deletes(curr, prev, Seq("id")).select("id").as[Long].collect().sorted
      === Array(4L))
    // null -> 30 is an update (null-safe compare); 1 is unchanged
    assert(Cdc.updates(curr, prev, Seq("id")).select("id").as[Long].collect().sorted
      === Array(2L, 3L))
  }

  test("applyDelta reconstructs curr exactly") {
    val prev = snap(1L -> 10L, 2L -> 20L, 3L -> null, 4L -> 40L)
    val curr = snap(1L -> 10L, 2L -> 21L, 3L -> 30L, 5L -> 50L)
    val merged = Cdc.applyDelta(
      prev,
      Cdc.inserts(curr, prev, Seq("id")),
      Cdc.updates(curr, prev, Seq("id")),
      Cdc.deletes(curr, prev, Seq("id")),
      Seq("id"))
    assert(merged.orderBy("id").as[(Long, Option[Long])].collect()
      === curr.orderBy("id").as[(Long, Option[Long])].collect())
  }

  test("tile assignment is total, deterministic, and in range") {
    val df = spark.range(1000).select(col("id"))
    val t1 = df.select(Cdc.tileXxhash64(Seq(col("id")), 8).as("t"))
    val t2 = df.select(Cdc.tileXxhash64(Seq(col("id")), 8).as("t"))
    assert(t1.as[Long].collect() === t2.as[Long].collect())
    assert(t1.agg(min("t"), max("t")).as[(Long, Long)].head() === ((0L, 7L)))
    // all 8 tiles populated on 1000 keys
    assert(t1.distinct().count() === 8)
  }

  test("reconcile missing/extra/common are disjoint and complete") {
    val src = Seq(1L, 2L, 3L, 4L).toDF("id")
    val tgt = Seq(2L, 3L, 9L).toDF("id")
    assert(Cdc.reconcileMissing(src, tgt, Seq("id")).as[Long].collect().sorted === Array(1L, 4L))
    assert(Cdc.reconcileExtra(src, tgt, Seq("id")).as[Long].collect().sorted === Array(9L))
    assert(Cdc.reconcileCommon(src, tgt, Seq("id")).as[Long].collect().sorted === Array(2L, 3L))
  }

  test("reconcileReport: every direction present, sample bounded and ordered") {
    val src = Seq(1L, 2L, 3L, 4L, 10L, 11L).toDF("id")
    val tgt = Seq(2L, 3L, 4L, 10L, 11L).toDF("id")  // nothing extra
    val rep = Cdc.reconcileReport(src, tgt, Seq("id"), sampleSize = 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rep.keySet == Set("missing_in_target", "extra_in_target", "common"))
    assert(rep("missing_in_target") == ((1L, "1")))
    // zero-count direction still reports, with an empty sample
    assert(rep("extra_in_target") == ((0L, "")))
    // count is the FULL count; sample is the 3 lexicographically lowest
    // keys ("10" < "2" in the string key space — deterministic, both
    // engines sort bytes)
    assert(rep("common") == ((5L, "10,11,2")))
    // composite pk renders as a '|'-joined tuple
    val srcC = Seq((1L, "a"), (1L, "b")).toDF("id", "sub")
    val tgtC = Seq((1L, "a")).toDF("id", "sub")
    val repC = Cdc.reconcileReport(srcC, tgtC, Seq("id", "sub"), sampleSize = 5)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(repC("missing_in_target") == "1|b")
    assert(repC("common") == "1|a")
  }
}
