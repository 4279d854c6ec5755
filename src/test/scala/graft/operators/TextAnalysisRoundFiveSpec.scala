package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 text-analysis operators: Zipf fit, entropy, TTR, normalize. */
class TextAnalysisRoundFiveSpec extends SparkSpec {
  import spark.implicits._

  test("zipfFit recovers the exponent of an exact power-law corpus") {
    // token tN appears round(1000 / N) times → ln(freq) ≈ -1·ln(rank) + ln(1000)
    val docs = (1 to 20).flatMap { n =>
      Seq.fill(math.round(1000.0 / n).toInt)(s"t${"%02d".format(n)}")
    }.grouped(50).map(_.mkString(" ")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toSeq.toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs, "text", fitV = 20).collect().head
    assert(r.getAs[Long]("n") === 20L)
    val slope = r.getAs[Double]("slope")
    val intercept = r.getAs[Double]("intercept")
    // rounding of 1000/N keeps the fit near the ideal -1 / ln(1000)=6.9078
    assert(math.abs(slope + 1.0) < 0.01, s"slope $slope")
    assert(math.abs(intercept - math.log(1000.0)) < 0.02, s"intercept $intercept")
  }

  test("tokenEntropy: uniform source maxes, constant source zeroes") {
    val docs = Seq(
      (1L, "u", "a b c d"),     // 4 distinct, uniform → H = ln 4
      (2L, "k", "x x x x")      // constant → H = 0
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.tokenEntropy(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("u") == ((4L, 4L, math.rint(math.log(4.0) * 1e6) / 1e6)))
    assert(got("k") == ((4L, 1L, 0.0)))
  }

  test("ttrProfile: corpus vs doc-level TTR diverge on cross-doc repeats") {
    // each doc internally diverse (TTR 1.0) but docs repeat each other
    val docs = Seq(
      (1L, "s", "a b"), (2L, "s", "a b"), (3L, "s", "a b"), (4L, "s", "c d")
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.ttrProfile(docs, "doc_id", "source", "text")
      .collect().head
    assert(r.getAs[Long]("n_docs") === 4L)
    // corpus: 4 types / 8 tokens = 500000 ppm; docs: each 1.0
    assert(r.getAs[Long]("corpus_ttr_ppm") === 500000L)
    assert(r.getAs[Double]("mean_doc_ttr") === 1.0)
  }

  test("bm25TopK: rare terms outrank common ones; length normalizes") {
    val docs = Seq(
      (1L, "rare common common common"),
      (2L, "common common common common"),
      (3L, "rare rare common filler filler filler filler filler"),
      (4L, "filler filler filler filler")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs, "doc_id", "text",
        Seq("rare", "common"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = got.map(t => t._1 -> t).toMap
    // doc 4 matches nothing → absent
    assert(!byDoc.contains(4L) && byDoc.size == 3)
    // docs containing 'rare' (df=2 of 4) beat the common-only doc
    val ordered = got.sortBy(t => (-t._3, t._1)).map(_._1).toSeq
    assert(ordered.head != 2L)
    // doc 1 matches both terms
    assert(byDoc(1L)._2 == 2L)
  }

  test("calibrationBins: bins are equi-depth and rates exact") {
    // 20 rows, score = i, target = 1 for the top half
    val df = (1 to 20).map(i => (i.toLong, i.toLong, if (i > 10) 1L else 0L))
      .toDF("doc_id", "score", "target")
    val bins = Analytics.calibrationBins(df,
        col("score") * (1L << 33) + col("doc_id"), "score", "target", k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(bins.keySet == Set(1L, 2L, 3L, 4L))
    // 5 rows per bin; bin 3 = scores 11..15 (all positive)
    assert(bins(1L) == ((5L, 3.0, 0L, 0L)))
    assert(bins(3L) == ((5L, 13.0, 5L, 1000000L)))
    assert(bins(4L) == ((5L, 18.0, 5L, 1000000L)))
  }

  test("trigramBackoffScore: all three backoff levels score correctly") {
    // train doc 1: trigrams (a,b,c),(b,c,a),(c,a,b),(a,b,d); bigrams
    // ab x2, bc, ca, bd; unigrams a2 b2 c1 d1; N=6
    val docs = Seq(
      (1L, "a b c a b d"),
      (10L, "a b c"),   // known trigram: p = c3/c12 = 1/2
      (20L, "x b c"),   // backoff to bigram: p = 0.4 * c(b,c)/c(b) = 0.2
      (30L, "x y z")    // backoff to unigram, z OOV: p = 0.16 * 1/6
    ).toDF("doc_id", "text")
    val got = TextAnalysis.trigramBackoffScore(docs, "doc_id", "text",
        holdoutMod = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(10L) == ((1L, math.rint(math.log(0.5) * 1e6) / 1e6, 0L, 0L)))
    assert(got(20L) == ((1L, math.rint(math.log(0.2) * 1e6) / 1e6, 1L, 0L)))
    val pOov = 0.16 / 6.0
    assert(got(30L)._3 == 0L && got(30L)._4 == 1L)
    assert(math.abs(got(30L)._2 - math.log(pOov)) < 1e-5)
    assert(got.size == 3) // train docs never score
  }

  test("compactionPlan bins the id-ordered byte stream per partition") {
    val files = Seq(
      ("p", 1L, 4L), ("p", 2L, 4L), ("p", 3L, 4L), ("p", 4L, 10L),
      ("p", 5L, 2L), ("q", 9L, 3L)
    ).toDF("part", "file_id", "bytes")
    val got = Packing.compactionPlan(files, "part", "file_id", "bytes",
        targetBytes = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // cum-before in p: 0,4,8,12,22 → bins 0,0,0,1,2
    assert(got(("p", 0L)) == ((3L, 12L, 1L, 3L)))
    assert(got(("p", 1L)) == ((1L, 10L, 4L, 4L)))
    assert(got(("p", 2L)) == ((1L, 2L, 5L, 5L)))
    assert(got(("q", 0L)) == ((1L, 3L, 9L, 9L)))
  }

  test("latenessReport: counts conserved, drops monotone in W, bound respected") {
    val events = graft.Tables.events(spark, sfDir)
    val rep = Analytics.latenessReport(events, "event_id", "ts",
        maxDelaySeconds = 600, windowSeconds = 3600L,
        thresholds = Seq(0L, 300L, 600L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val windows = rep.keys.map(_._1).toSet
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val (n0, d0) = rep((w, 0L))
      val (n3, d3) = rep((w, 300L))
      val (n6, d6) = rep((w, 600L))
      // every threshold sees the same event population
      assert(n0 == n3 && n3 == n6)
      // drops shrink as the watermark loosens; at W = maxDelay none drop
      assert(d0 >= d3 && d3 >= d6)
      assert(d6 == 0L)
    }
  }

  test("segmentLangProfile flags a code-switched document") {
    // profiles: en={aa,bb}, fr={cc,dd} (each lang's top tokens). doc 3 is
    // labeled en but its second 4-token segment is pure fr.
    val docs = Seq(
      (1L, "en", "aa bb aa bb aa bb aa bb"),
      (2L, "fr", "cc dd cc dd cc dd cc dd"),
      (3L, "en", "aa bb aa aa cc dd cc dd")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.segmentLangProfile(docs, "doc_id", "text", "lang",
        segTokens = 4, profileSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((2L, 1L, "en", false)))
    assert(got(2L) == ((2L, 1L, "fr", false)))
    // doc 3: segment 0 → en, segment 1 → fr ⇒ mixed, majority tie → en
    assert(got(3L) == ((2L, 2L, "en", true)))
  }

  test("rrfFuse merges rankings by reciprocal rank, rank-only") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (10L, 2L), (40L, 3L)).toDF("doc_id", "rank")
    val got = TextAnalysis.rrfFuse(Seq(a, b), kConst = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = got.map(t => t._1 -> t).toMap
    def rr(r: Long) = math.rint(1e9 / (60.0 + r)) / 1e9
    // 10 and 20 each appear at ranks {1,2} → identical fused scores
    assert(byDoc(10L)._2 == 2L && byDoc(20L)._2 == 2L)
    assert(byDoc(10L)._3 == byDoc(20L)._3)
    assert(byDoc(10L)._3 == math.rint((rr(1) + rr(2)) * 1e6) / 1e6)
    // single-list docs trail the double-list ones
    assert(byDoc(30L)._2 == 1L && byDoc(40L)._2 == 1L)
    assert(got.sortBy(t => (-t._3, t._1)).map(_._1).toSeq ==
      Seq(10L, 20L, 30L, 40L))
  }

  test("tfidfQueryTopK: rare term dominates, non-matching docs absent") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common common"),
      (3L, "filler filler")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfQueryTopK(docs, "doc_id", "text",
        Seq("rare", "common"), topK = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!got.contains(3L))
    // doc1: 1·ln(3/1) + 2·ln(3/2); doc2: 4·ln(3/2)
    val d1 = math.rint((math.rint(math.log(3.0) * 1e9) / 1e9 +
      math.rint(2 * math.log(1.5) * 1e9) / 1e9) * 1e6) / 1e6
    assert(math.abs(got(1L) - d1) < 1e-9)
    assert(got(2L) > 0 && got(1L) > got(2L) == (d1 > got(2L)))
  }

  test("normalizeText canonicalizes case, punctuation and spacing") {
    val docs = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "  already clean  ")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.normalizeText(docs, "text")
      .select(col("doc_id"), col("norm_text"), col("changed"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2))))
      .toMap
    assert(m(1L) == (("hello world", true)))
    assert(m(2L) == (("hello world", false)))
    assert(m(3L) == (("already clean", true)))
    // variants 1 and 2 now collide for exact dedup
    assert(m(1L)._1 == m(2L)._1)
  }

  test("klDivergenceSources: zero when a source matches the pool, positive when skewed") {
    val docs = Seq(
      (1L, "x", "a b"), (2L, "x", "a b"),
      (3L, "y", "a b"), (4L, "y", "a b")
    ).toDF("doc_id", "source", "text")
    val same = TextAnalysis.klDivergenceSources(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // both sources have the exact corpus distribution → KL = 0 (and the
    // +0.0 fold keeps the rounded zero positive)
    assert(same("x") === 0.0 && !(1.0 / same("x") < 0))
    assert(same("y") === 0.0)
    val skewed = Seq(
      (1L, "x", "a a a a"), (2L, "y", "a b b b")
    ).toDF("doc_id", "source", "text")
    val kl = TextAnalysis.klDivergenceSources(skewed, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // x: p(a)=1 vs corpus p(a)=5/8 → KL = ln(8/5)
    assert(math.abs(kl("x") - math.log(8.0 / 5.0)) < 1e-6)
    assert(kl("y") > 0.0)
  }

  test("templateTopK ranks leading-token templates with dense ties") {
    val docs = Seq(
      (10L, "s1", "the quick brown fox one"),
      (11L, "s2", "the quick brown fox two"),
      (12L, "s1", "the quick brown fox three"),
      (13L, "s1", "lone wolf document here"),
      (14L, "s2", "another single doc text")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.templateTopK(docs, "doc_id", "source", "text",
        prefixTokens = 4, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.length === 2)
    assert(got.head === ((1L, "the quick brown fox", 3L, 2L, 10L)))
    // rank-2 is the lexicographically first of the count-1 templates
    assert(got(1)._1 === 2L && got(1)._3 === 1L)
  }

  test("ngramNovelty: df=1 bigrams over distinct per-doc grams") {
    val docs = Seq(
      (1L, "a b c"),       // bigrams: "a b" (shared), "b c" (unique)
      (2L, "a b a b"),     // distinct bigrams: "a b" (shared), "b a" (unique)
      (3L, "x y")          // "x y" unique
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((2L, 1L, 500000L)))
    assert(got(2L) === ((2L, 1L, 500000L)))   // repeats collapse first
    assert(got(3L) === ((1L, 1L, 1000000L)))
  }

  test("tokenizerFertility: integer-exact per-source ratios") {
    val docs = Seq(
      ("a", "one two three four", 20L),   // 4 words, (20+3)//4 = 5 subtoks
      ("a", "five six", 9L),              // 2 words, 3 subtoks
      ("b", "x", 4L)                      // 1 word, 1 subtok
    ).toDF("source", "text", "n_chars")
    val got = TextAnalysis.tokenizerFertility(docs, "source", "text", "n_chars")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // a: 8 subtokens / 6 words → 1.333333e6 ppm; 29 chars / 8 subtoks
    assert(got("a") === ((2L, 6L, 8L, 1333333L, 3625000L)))
    assert(got("b") === ((1L, 1L, 1L, 1000000L, 4000000L)))
  }

  test("preferencePairs: strict-gap groups with deterministic tie-breaks") {
    val docs = Seq(
      // template "p q": scores 5, 3, 5 → chosen id 1 (tie → smaller id),
      // rejected id 3 (worst score)
      (1L, "p q", 5L), (2L, "p q", 3L), (3L, "p q", 5L),
      // template "r s": equal scores → no strict gap → dropped
      (4L, "r s", 2L), (5L, "r s", 2L),
      // singleton group dropped
      (6L, "t u", 9L)
    ).toDF("doc_id", "text", "score")
    val got = TextAnalysis.preferencePairs(docs, "doc_id", "text", "score",
        prefixTokens = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(("p q", 3L, 1L, 5L, 2L, 3L)))
  }
}
