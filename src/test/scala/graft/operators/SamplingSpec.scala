package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Temperature resampling: exact per-group targets, hash-deterministic
  * selection, and the flattening property (small groups keep a larger
  * share than big ones).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // skewed groups: 100 'a', 25 'b', 4 'c'
  private def corpus = (
    (0 until 100).map(i => (s"a$i", "a")) ++
    (0 until 25).map(i => (s"b$i", "b")) ++
    (0 until 4).map(i => (s"c$i", "c"))
  ).toDF("k", "g")

  test("T=2 keeps min(c, ceil(scale*sqrt(c))) per group") {
    val got = Sampling.temperatureResample(corpus, "g", "k", scale = 2.0)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    // a: ceil(2*10)=20 of 100; b: ceil(2*5)=10 of 25; c: ceil(2*2)=4 of 4
    assert(got == Map("a" -> 20L, "b" -> 10L, "c" -> 4L))
  }

  test("selection is identical across partitionings") {
    def run(parts: Int) =
      Sampling.temperatureResample(corpus.repartition(parts), "g", "k", 2.0)
        .select("k").as[String].collect().sorted.toSeq
    assert(run(1) == run(7))
  }

  test("flattening: kept share grows as group size shrinks") {
    val got = Sampling.temperatureResample(corpus, "g", "k", scale = 2.0)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    val share = Map("a" -> got("a") / 100.0, "b" -> got("b") / 25.0,
      "c" -> got("c") / 4.0)
    assert(share("a") < share("b") && share("b") < share("c"))
  }

  test("general temperature (pow path) respects the target formula") {
    val got = Sampling.temperatureResample(corpus, "g", "k",
        scale = 2.0, temperature = 3.0)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    def tgt(c: Int) = math.min(c, math.ceil(2.0 * math.pow(c, 1.0 / 3)).toLong)
    assert(got == Map("a" -> tgt(100), "b" -> tgt(25), "c" -> tgt(4)))
  }

  test("weightedSample: degenerate weights, monotonicity, determinism") {
    val df = (0 until 500).map(i => (i.toLong, i % 100)).toDF("k", "w")
    def kept(num: org.apache.spark.sql.Column): Set[Long] =
      Sampling.weightedSample(df, "k", num, weightDen = 100L)
        .select("k").as[Long].collect().toSet
    // weight 0 keeps nothing; weight = den keeps everything
    assert(kept(lit(0L)).isEmpty)
    assert(kept(lit(100L)).size === 500)
    // per-row monotone: every row kept at weight w stays kept at w+20
    val atW = kept(col("w"))
    assert(atW.nonEmpty && atW.size < 500)
    assert(atW.subsetOf(kept(least(col("w") + 20, lit(100)))))
    // same selection on a different partitioning
    assert(kept(col("w")) ===
      Sampling.weightedSample(df.repartition(7), "k", col("w"), 100L)
        .select("k").as[Long].collect().toSet)
  }

  test("sourceCap keeps the cap best-scored docs per source, ranked") {
    val docs = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.5), ("a", 3L, 0.9), ("a", 4L, 0.7),
      ("b", 5L, 0.1),
      ("c", 6L, 0.3), ("c", 7L, 0.3), ("c", 8L, 0.8)
    ).toDF("source", "doc_id", "quality")
    val got = Sampling.sourceCap(docs, "source", "doc_id", "quality", cap = 2)
      .select("source", "rank", "doc_id", "quality")
      .as[(String, Long, Long, Double)].collect().toSet
    // per source: top-2 by quality desc, doc_id asc tie-break; sources
    // under the cap keep everything
    assert(got == Set(
      ("a", 1L, 1L, 0.9), ("a", 2L, 3L, 0.9),
      ("b", 1L, 5L, 0.1),
      ("c", 1L, 8L, 0.8), ("c", 2L, 6L, 0.3)))
    // determinism under repartitioning (the bounded-heap partial stage
    // must not make the keep set partitioning-dependent)
    val got2 = Sampling.sourceCap(docs.repartition(5), "source", "doc_id",
        "quality", cap = 2)
      .select("source", "rank", "doc_id", "quality")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(got2 == got)
  }

  test("tokenBudgetSelect equals the naive sorted-prefix definition") {
    val docs = Seq(
      // source a: scores 9,9,7,7,7,3 with tokens 40,40,30,30,30,10
      ("a", 1L, 40L, 9L), ("a", 2L, 40L, 9L),
      ("a", 3L, 30L, 7L), ("a", 4L, 30L, 7L), ("a", 5L, 30L, 7L),
      ("a", 6L, 10L, 3L),
      // source b fits entirely
      ("b", 7L, 50L, 5L), ("b", 8L, 20L, 1L)
    ).toDF("source", "doc_id", "toks", "score")
    // budget 110 for a: 40+40 full (score 9, cum 80); score-7 group cum
    // 170 > 110 → boundary, room 30 → doc 3 only; score 3 out.
    val got = Sampling.tokenBudgetSelect(docs, "doc_id", "source", "toks",
        "score", budget = 110L)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 7L), ("b", 8L)))
    // naive definition computed with a per-source sorted window must agree
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs.withColumn("cum", sum(col("toks")).over(w))
      .filter(col("cum") <= 110L)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(got === naive)
  }

  test("tokenBudgetSelect: boundary group with zero room selects nothing there") {
    val docs = Seq(
      ("a", 1L, 100L, 9L),   // fills the budget exactly
      ("a", 2L, 10L, 5L),    // boundary group, room 0
      ("a", 3L, 10L, 5L)
    ).toDF("source", "doc_id", "toks", "score")
    val got = Sampling.tokenBudgetSelect(docs, "doc_id", "source", "toks",
        "score", budget = 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L))
  }

  test("mixtureEpochs: sqrt-weights up-sample small sources") {
    val docs = Seq(
      ("big", 90000L), ("big", 70000L),     // 160000 tokens
      ("small", 6000L), ("small", 4000L)    // 10000 tokens
    ).toDF("source", "toks")
    val got = Sampling.mixtureEpochs(docs, "source", "toks",
        targetTotal = 100000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val wBig = math.sqrt(160000.0)
    val wSmall = math.sqrt(10000.0)
    val sw = wBig + wSmall
    assert(got("big")._1 === 160000L)
    assert(math.abs(got("big")._2 - wBig / sw) < 1e-6)
    assert(math.abs(got("small")._3 - 100000.0 * (wSmall / sw) / 10000.0) < 1e-6)
    // the small source runs MORE epochs than the big one
    assert(got("small")._3 > got("big")._3)
    // √-temperature keeps every weight strictly inside (0, 1)
    got.values.foreach { case (_, w, _) => assert(w > 0.0 && w < 1.0) }
  }
}
