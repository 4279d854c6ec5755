package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("connectedComponents labels each clique with its min id") {
    val spark0 = spark
    import spark0.implicits._
    // two cliques {1,2,3} (via chain) and {10,11}, isolated pair {20,21};
    // a chain 30-31-32-33 exercises multi-hop propagation
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L), (20L, 21L),
      (30L, 31L), (31L, 32L), (32L, 33L)).toDF("doc_a", "doc_b")
    val got = Clustering.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L))
  }

  test("dedupClusters flags exactly one survivor per cluster") {
    val spark0 = spark
    import spark0.implicits._
    val pairs = Seq((5L, 3L), (5L, 9L), (7L, 8L)).toDF("doc_a", "doc_b")
    val rows = Clustering.dedupClusters(pairs, "doc_a", "doc_b").collect()
    val byCluster = rows.groupBy(_.getLong(1))
    assert(byCluster.keySet == Set(3L, 7L))
    byCluster.values.foreach { members =>
      assert(members.count(_.getBoolean(2)) == 1)
      assert(members.filter(_.getBoolean(2)).map(_.getLong(0)).head ==
        members.map(_.getLong(0)).min)
    }
  }

  test("hashSample is deterministic and rate-proportional") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 2000L).toDF("k")
    val a = Sampling.hashSample(df, "k", 0.1).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "k", 0.1).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size > 100 && a.size < 350) // ~200 expected
    // monotone: a smaller rate selects a subset
    val c = Sampling.hashSample(df, "k", 0.05).collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("stratifiedSample returns exactly perStratum rows per stratum") {
    val spark0 = spark
    import spark0.implicits._
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("k", "g")
    val out = Sampling.stratifiedSample(df, "g", "k", 7)
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("g0" -> 7L, "g1" -> 7L, "g2" -> 7L))
    // deterministic
    assert(out.collect().map(_.getLong(0)).sorted.toSeq ==
      Sampling.stratifiedSample(df, "g", "k", 7).collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("tfidf ranks rare terms above common ones") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common other other")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'common' appears in all docs -> idf 0; doc 1's top must be 'rare'
    assert(top(1L) == "rare")
    assert(top(3L) == "other")
  }

  test("bpePairCounts weights bigrams by corpus word frequency, per position") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "aaa bb aaa"), (2L, "bb cc!dd")).toDF("doc_id", "text")
    // word counts: aaa:2 bb:2 cc:1 dd:1; "aaa" holds "aa" at TWO positions
    // -> pair "aa" counts 2 per occurrence = 4 total
    val got = TextAnalysis.bpePairCounts(docs, "text", topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "aa", 4L), (2L, "bb", 2L), (3L, "cc", 1L),
      (4L, "dd", 1L)))
  }

  test("redact masks all spans and counts them") {
    val spark0 = spark
    import spark0.implicits._
    val df = Seq((1L, "call 12345 or 678"), (2L, "no digits")).toDF("id", "t")
    val out = TextAnalysis.redact(df, "t", "[0-9]+", "<NUM>")
      .collect().map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(out(1L) == (("call <NUM> or <NUM>", 2L)))
    assert(out(2L) == (("no digits", 0L)))
  }

  test("ngramCounts counts non-distinct bigrams") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val m = TextAnalysis.ngramCounts(docs, "doc_id", "text", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a b" -> 3L, "b a" -> 1L))
  }

  // The single-run stageCounts rests on two CollectMetrics properties;
  // pin them so a Spark upgrade that changes either fails loudly here
  // rather than as silently wrong stage counts.
  test("observe: no double count under subtree reuse, filter-pushdown barrier") {
    val spark0 = spark
    import spark0.implicits._
    val base = (1 to 100).toDF("id")
    val reuse = org.apache.spark.sql.Observation("reuse_n")
    val observed = base.observe(reuse, count(lit(1)).as("n"))
    val keep = observed.filter(col("id") % 2 === 0).select(col("id").as("keep_id"))
    observed.join(keep, col("id") === col("keep_id")).count()
    assert(reuse.get("n") === 100L) // referenced twice, counted once

    val barrier = org.apache.spark.sql.Observation("barrier_n")
    base.observe(barrier, count(lit(1)).as("n")).filter(col("id") <= 10).count()
    assert(barrier.get("n") === 100L) // downstream filter not pushed below
  }

  test("stageCounts equals independent per-stage counts") {
    val spark0 = spark
    import spark0.implicits._
    val docs = (1 to 200).map { i =>
      val text =
        if (i % 7 == 0) "dup dup dup dup dup dup dup dup dup dup" // repetition-gated
        else if (i % 5 == 0) s"exact duplicate body shared by many docs"
        else s"unique document number $i with enough distinct words to pass gates cleanly"
      (i.toLong, text, if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val cfg = CurationPipeline.Config(perLangSample = 10)
    val st = CurationPipeline.stages(docs, "doc_id", "text", "lang", cfg)
    val expected = Seq(st.input, st.afterExact, st.gated, st.deduped, st.sampled)
      .map(_.count())
    val got = CurationPipeline.stageCounts(docs, "doc_id", "text", "lang", cfg)
      .orderBy("stage").collect()
    assert(got.map(_.getLong(2)).toSeq === expected)
    assert(got.map(_.getString(1)).toSeq === CurationPipeline.stageNames)
  }

  test("bigramLmScore matches the hand-computed add-one model") {
    val spark0 = spark
    import spark0.implicits._
    // tokens: a x3, b x2, c x1 -> V=3; bigrams: "a b" x2, "a c" x1
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    // p(b|a) = (2+1)/(3+3) = 0.5; p(c|a) = (1+1)/(3+3) = 1/3
    assert(out(1L) === ((1L, 0.5, 500000000000L)))
    assert(out(2L) === ((1L, 0.5, 500000000000L)))
    assert(out(3L) ===
      ((1L, 333333333333L.toDouble / 1.0 / 1.0e12, 333333333333L)))
  }

  test("classifierScore sums matched hashed-feature weights per doc") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "a b a"), (2L, "c")).toDF("doc_id", "text")
    val w = TextAnalysis.syntheticWeights(spark, dims = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // weights are the documented formula, bounded to [-8, 8]
    assert(w.keySet === (0L until 64L).toSet)
    assert(w.values.forall(v => v >= -8 && v <= 8))
    assert(w(5L) === 5L * 2654435761L % 17 - 8)
    val out = TextAnalysis.classifierScore(docs, "doc_id", "text",
        TextAnalysis.syntheticWeights(spark, 64), dims = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def feat(t: String): Long = {
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(t).take(8), 16)
      h % 64
    }
    assert(out(1L) === ((3L, 2 * w(feat("a")) + w(feat("b")))))
    assert(out(2L) === ((1L, w(feat("c")))))
  }

  test("oovRate: vocab cutoff by (count desc, token asc), exact ppm") {
    val spark0 = spark
    import spark0.implicits._
    // counts: a x4, b x2, c x2, z x1 -> top-2 vocab = {a, b} (c ties b,
    // loses the token-asc tie-break only when ranked after b... b < c so
    // vocab = {a, b}); oov tokens: c, z
    val docs = Seq((1L, "a a b c"), (2L, "a a b c z")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((4L, 1L, 250000L)))
    assert(out(2L) === ((5L, 2L, 400000L)))
  }
}
