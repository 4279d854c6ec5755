package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScansSpec extends SparkSpec {

  /** Spread width read from the initial physical plan's shuffle exchange
    * (string form — the AQE wrapper hides the subtree from collect).
    */
  private def shuffleWidth(df: org.apache.spark.sql.DataFrame): Int = {
    val plan = df.queryExecution.executedPlan.toString
    if (plan.contains("Exchange SinglePartition")) 1
    else {
      val m = "Exchange hashpartitioning\\([^)]*?(\\d+)\\)".r
        .findFirstMatchIn(plan)
      assert(m.isDefined, s"no shuffle exchange in:\n$plan")
      m.get.group(1).toInt
    }
  }

  test("spreadByKey caps the width by the input's size estimate") {
    val spark0 = spark
    import spark0.implicits._
    // documents at sf0.001 is a few KB on disk — far under one 64 KB cap
    // unit — so the spread must collapse to one partition instead of the
    // configured shuffle parallelism (4 in this suite).
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(shuffleWidth(Scans.spreadByKey(docs, col("doc_id"))) === 1)
    // a relation estimated well beyond width*64 KB saturates the session
    // parallelism: the cap is invisible at scale
    val wide = spark.range(100000).select(col("id"),
      lit("x" * 64).as("pad"))
    assert(shuffleWidth(Scans.spreadByKey(wide, col("id"))) ===
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // row identity: the spread only moves rows
    val got = Scans.spreadByKey(docs, col("doc_id")).collect()
    assert(got.length === docs.count())
  }

  test("spreadByKeyWide pins the session parallelism regardless of size") {
    val ids = spark.range(10).toDF()
    assert(shuffleWidth(Scans.spreadByKeyWide(ids, col("id"))) ===
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
  }
}
