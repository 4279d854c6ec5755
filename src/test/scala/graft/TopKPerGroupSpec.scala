package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerGroup
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class TopKPerGroupSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("TopKPerGroup equals the row_number window idiom, ties included") {
    val spark0 = spark
    import spark0.implicits._
    // skewed groups, duplicated scores to exercise tie-breaks
    val rows = samples(Gen.zip(
      Gen.frequency(5 -> Gen.const(0), 5 -> Gen.choose(1, 30)),
      Gen.choose(0, 9)), 2000)
      .zipWithIndex.map { case ((g, score), i) => (g, score, i.toLong) }
    val df = rows.toDF("g", "score", "id").repartition(7)
    for (k <- Seq(1, 3, 10)) {
      val custom = TopKPerGroup(df, Seq(col("g")),
          Seq(col("score").desc, col("id")), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
      val window = df.withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
        .filter(col("rank") <= k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet
      assert(custom == window && window.nonEmpty, s"k=$k")
    }
  }

  test("partial stage caps shuffle input at k rows per group per partition") {
    val spark0 = spark
    import spark0.implicits._
    val df = (0 until 10000).map(i => (i % 4, i)).toDF("g", "v").repartition(8)
    val out = TopKPerGroup(df, Seq(col("g")), Seq(col("v").desc), 2)
    assert(out.count() == 8) // 4 groups x k=2
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    // both stages present: partial before the exchange, final after
    assert("TopKPerGroupExec?".r.findAllIn(plan).length >= 2 ||
      plan.split("Exchange").length >= 2)
  }
}
