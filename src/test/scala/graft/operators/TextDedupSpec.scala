package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class TextDedupSpec extends SparkSpec {

  private def docs = {
    val spark0 = spark
    import spark0.implicits._
    Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),           // exact dup of 1
      (3L, "a b c d e f"),         // near dup of 1 (shingle jaccard 3/4)
      (4L, "x y z w q r s t")      // unrelated
    ).toDF("doc_id", "text")
  }

  test("shingles: distinct word 3-grams, empty below 3 words") {
    val spark0 = spark
    import spark0.implicits._
    val out = Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text")
      .select(col("doc_id"), TextDedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L).isEmpty)
  }

  test("exactGroups keeps min id and counts dups") {
    val m = TextDedup.exactGroups(docs, "doc_id", "text").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(m(1L) == 2L)                     // keep_id 1 has 2 copies
    assert(m.values.sum == 4L)
  }

  test("jaccardPairs finds exact and near dups above threshold") {
    val pairs = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
  }

  test("minhashLshPairs equals the exhaustive jaccard pairs on real docs") {
    val d = Tables.documents(spark, sfDir)
    val exact = TextDedup.jaccardPairs(d, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = TextDedup.minhashLshPairs(d, "doc_id", "text", 3, 128, 32, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == exact && exact.nonEmpty)
  }

  test("minhashLshPairsAgainst equals the cross-side slice of the exhaustive pairs") {
    val d = Tables.documents(spark, sfDir)
    val incoming = d.filter(col("doc_id") % 5 === 0)
    val corpus = d.filter(col("doc_id") % 5 =!= 0)
    // exhaustive cross-side reference: all jaccard pairs, keep those with
    // exactly one member in the incoming set, oriented incoming-first
    val exact = TextDedup.jaccardPairs(d, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) =>
        (a % 5 == 0, b % 5 == 0) match {
          case (true, false) => Some((a, b, j))
          case (false, true) => Some((b, a, j))
          case _ => None
        }
      }.toSet
    val got = TextDedup.minhashLshPairsAgainst(incoming, corpus,
        "doc_id", "text", 3, 128, 32, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == exact && exact.nonEmpty)
  }

  test("applyDedup keeps canonical members and untouched docs") {
    val spark0 = spark
    import spark0.implicits._
    val all = Seq(1L, 2L, 3L, 4L, 7L).toDF("doc_id")
    // clusters {1,2,3} (via chain) and {4}∅; 7 untouched
    val pairs = Seq((2L, 1L), (2L, 3L)).toDF("doc_a", "doc_b")
    val kept = Clustering.applyDedup(all, pairs, "doc_id", "doc_a", "doc_b")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L, 7L))
  }

  test("dedupSavings accounts docs and weights per group exactly") {
    val spark0 = spark
    import spark0.implicits._
    val all = Seq((1L, "s1", 10L), (2L, "s1", 20L), (3L, "s2", 30L),
      (4L, "s2", 40L)).toDF("doc_id", "source", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b") // cluster {1,2,3}
    val out = Clustering.dedupSavings(all, pairs, "doc_id", "doc_a", "doc_b",
        "source", "n_chars")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // survivor of {1,2,3} is 1; doc 4 untouched
    assert(out == Seq(("s1", 2L, 1L, 30L, 10L), ("s2", 2L, 1L, 70L, 40L)))
  }

  test("MinHashAgg band keys equal the declarative xxhash64 formulation") {
    import org.apache.spark.sql.graft.MinHashAggFunctions
    val numPerm = 16
    val bands = 4
    val hashed = TextDedup.shingleHashTable(docs, "doc_id", "text", 3)
    // declarative reference: numPerm min(xxhash64(h, i)) columns, band key
    // = multi-arg xxhash64 over each band's rows
    val minCols = (0 until numPerm).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    val sig = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val expected = sig.select(col("doc_id") +: (0 until bands).map { b =>
      xxhash64((b * 4 until (b + 1) * 4).map(i => col(s"m$i")): _*).as(s"bk$b")
    }: _*).collect().map(r => r.getLong(0) -> (1 to bands).map(r.getLong)).toMap
    val got = hashed.groupBy("doc_id")
      .agg(MinHashAggFunctions.minhashBandKeys(col("h"), numPerm, bands).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.view.mapValues(_.toSeq).toMap ==
      expected.view.mapValues(_.toSeq).toMap)
    // and the signature variant matches the raw min columns
    val gotSig = hashed.groupBy("doc_id")
      .agg(MinHashAggFunctions.minhashSig(col("h"), numPerm).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val expSig = sig.collect()
      .map(r => r.getLong(0) -> (1 to numPerm).map(r.getLong).toSeq).toMap
    assert(gotSig == expSig)
  }

  test("simhashPairs finds all pairs within the hamming bound, none beyond") {
    val d = graft.Tables.documents(spark, sfDir)
    val maxH = 3
    val got = TextDedup.simhashPairs(d, "doc_id", "text", maxH)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exhaustive reference: all pairs of fingerprints within the bound
    val fps = TextDedup.simhash(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val expected = (for {
      (ia, fa) <- fps; (ib, fb) <- fps if ia < ib
      h = java.lang.Long.bitCount(fa ^ fb) if h <= maxH
    } yield (ia, ib, h.toLong)).toSet
    assert(got == expected)
    assert(got.nonEmpty) // the corpus contains exact dups -> hamming 0
    assert(got.forall(_._3 <= maxH))
  }

  test("simhash: identical docs share fingerprints, near dups are close") {
    val fp = TextDedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
    // stable across evaluations
    val fp2 = TextDedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp == fp2)
  }

  test("SimHashAgg equals the declarative 64-sum-column fingerprint") {
    val d = graft.Tables.documents(spark, sfDir)
    val toks = d.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1, lit(1L))
        .otherwise(lit(-1L))).as(s"b$j")
    }
    val declarative = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map { j =>
          when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
        }.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val typed = TextDedup.simhash(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(typed == declarative)
  }

  test("paragraphDedup keeps exactly the first occurrence of each segment") {
    val spark0 = spark
    import spark0.implicits._
    // 3-word paragraphs; doc 2 repeats doc 1's first paragraph, doc 3
    // repeats a paragraph within itself; doc 4 is a short tail segment
    val docs = Seq(
      (1L, "a b c d e f"),        // paras: "a b c", "d e f"
      (2L, "a b c x y z"),        // "a b c" is a cross-doc dup
      (3L, "p q r p q r"),        // intra-doc dup
      (4L, "tail")                // single short segment
    ).toDF("doc_id", "text")
    val out = TextDedup.paragraphDedup(docs, "doc_id", "text", wordsPerPara = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(3))).toMap
    assert(out.size == 7)
    assert(out((1L, 0L)) && out((1L, 1L)))      // firsts kept
    assert(!out((2L, 0L)))                       // cross-doc dup dropped
    assert(out((2L, 1L)))
    assert(out((3L, 0L)) && !out((3L, 1L)))      // intra-doc dup dropped
    assert(out((4L, 0L)))
  }

  test("packSequences: dense exact packing, deterministic, span math right") {
    val spark0 = spark
    import spark0.implicits._
    val docs = (1L to 100L).map(i => (i, 1L + (i * 7) % 50))
      .toDF("doc_id", "tokens")
    val out = graft.operators.Packing.packSequences(
      docs, "doc_id", "tokens", capacity = 64, buckets = 8).collect()
    assert(out.length == 100)
    val total = (1L to 100L).map(i => 1L + (i * 7) % 50).sum
    // dense: offsets cover the stream exactly; every row lands where the
    // cumulative stream says it should
    val rows = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    rows.foreach { case (_, tokens, seqId, off, spans) =>
      val start = seqId * 64 + off
      assert(spans == (start + math.max(tokens, 1) - 1) / 64 - seqId + 1)
    }
    // the packing is a permutation of a contiguous token stream
    val starts = rows.map { case (_, _, s, o, _) => s * 64 + o }.sorted
    val tokensByStart = rows.map { case (_, t, s, o, _) => (s * 64 + o, t) }
      .sortBy(_._1)
    assert(starts.head == 0L)
    tokensByStart.sliding(2).foreach {
      case Array((a, t), (b, _)) => assert(b == a + t)
      case _ =>
    }
    assert(tokensByStart.last._1 + tokensByStart.last._2 == total)
    // deterministic under different parallelism
    val again = graft.operators.Packing.packSequences(
      docs.repartition(13), "doc_id", "tokens", capacity = 64, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(again == rows.map(r => (r._1, r._3, r._4)).toSet)
  }

  test("removeBoilerplate drops frequent segments, reassembles in order") {
    val spark0 = spark
    import spark0.implicits._
    val d = Seq(
      (1L, "x y a b"),
      (2L, "x y c d"),
      (3L, "u v x y"),
      (4L, "x y")).toDF("doc_id", "text")
    val out = TextDedup.removeBoilerplate(d, "doc_id", "text",
        wordsPerPara = 2, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // "x y" occurs in 4 docs -> boilerplate; every other segment unique
    assert(out === Map(
      1L -> (("a b", 1L, 1L)),
      2L -> (("c d", 1L, 1L)),
      3L -> (("u v", 1L, 1L))))
    // doc 4 was pure boilerplate and dropped entirely
    assert(!out.contains(4L))
  }

  test("contaminationBloom output equals contamination exactly") {
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 17 =!= 0)
    val bench = all.filter(col("doc_id") % 17 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    val exact = canon(TextDedup.contamination(
      corpus, bench, "doc_id", "text", n = 3, minOverlap = 5))
    val bloomed = canon(TextDedup.contaminationBloom(
      corpus, bench, "doc_id", "text", n = 3, minOverlap = 5))
    assert(bloomed === exact)
    assert(exact.exists(_._3), "fixture should contain contaminated docs")
    // the prefilter must actually cut the corpus-side join input
    val docSh = TextDedup.shingleHashTable(corpus, "doc_id", "text", 3)
    val benchSh = TextDedup.shingleHashTable(bench, "doc_id", "text", 3)
      .select(col("h")).distinct()
    val bf = benchSh.stat.bloomFilter("h", math.max(benchSh.count(), 1L), 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val might = udf((h: Long) => bfB.value.mightContainLong(h))
    val kept = docSh.filter(might(col("h"))).count()
    assert(kept < docSh.count() / 2,
      s"bloom prefilter kept $kept of ${docSh.count()} corpus shingles")
  }

  test("containmentPairs flags doc-inside-doc that Jaccard misses") {
    val spark0 = spark
    import spark0.implicits._
    val short = (1 to 12).map(i => s"w$i").mkString(" ")          // 10 3-grams
    val long = short + " " + (100 to 160).map(i => s"x$i").mkString(" ")
    val other = (200 to 240).map(i => s"y$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, other)).toDF("doc_id", "text")
    val pairs = TextDedup.containmentPairs(docs, "doc_id", "text",
        n = 3, thresholdPpm = 900000L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(3), r.getLong(4)))).toMap
    // the short doc is fully contained: C(short->long) = 1.0 exactly
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L))._1 === 1000000L)
    assert(pairs((1L, 2L))._2 < 200000L) // asymmetry: long barely overlaps
    // Jaccard at the same pair is far below any dup threshold
    val j = TextDedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0)
      .filter(col("doc_a") === 1 && col("doc_b") === 2)
      .select("jaccard").as[Double].head()
    assert(j < 0.2, s"jaccard $j should be small where containment is 1.0")
  }

  test("containmentPairsCapped: exact values, df cap drops boilerplate-only pairs") {
    val spark0 = spark
    import spark0.implicits._
    val boiler = "big common footer block"                       // shared by all
    val docs = Seq(
      (1L, (1 to 12).map(i => s"w$i").mkString(" ") + " " + boiler),
      (2L, (1 to 12).map(i => s"w$i").mkString(" ") + " " +
        (100 to 140).map(i => s"x$i").mkString(" ") + " " + boiler),
      (3L, (200 to 220).map(i => s"y$i").mkString(" ") + " " + boiler),
      (4L, (300 to 320).map(i => s"z$i").mkString(" ") + " " + boiler))
      .toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    // cap above every df: identical to the exhaustive form
    val exhaustive = TextDedup.containmentPairs(docs, "doc_id", "text", 3, 100000L)
    val capHigh = TextDedup.containmentPairsCapped(docs, "doc_id", "text", 3,
      100000L, maxDf = 100L)
    assert(canon(capHigh) === canon(exhaustive))
    // cap 3 < df(boilerplate shingles)=4: pairs overlapping ONLY in the
    // boilerplate vanish; the genuine containment pair (1,2) survives
    // with values exactly equal to the exhaustive ones
    val capped = TextDedup.containmentPairsCapped(docs, "doc_id", "text", 3,
      100000L, maxDf = 3L)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cappedPairs.contains((1L, 2L)))
    assert(!cappedPairs.exists(p => p._1 == 3L || p._2 == 3L))
    val ex12 = canon(exhaustive.filter(col("doc_a") === 1 && col("doc_b") === 2))
    val cp12 = canon(capped.filter(col("doc_a") === 1 && col("doc_b") === 2))
    assert(cp12 === ex12)
  }

  test("repeatedSpans: exact span boundaries around a shared substring") {
    val spark0 = spark
    import spark0.implicits._
    // doc 1 = x1..x30; doc 2 embeds x5..x24 (20 shared tokens) at
    // position 10. With L=15, duplicated window starts are 4..9 in doc 1
    // (span [4, 24)) and 10..15 in doc 2 (span [10, 30)); nothing else
    // repeats.
    val shared = (5 to 24).map(i => s"x$i")
    val docs = Seq(
      (1L, (1 to 30).map(i => s"x$i").mkString(" ")),
      (2L, ((1 to 10).map(i => s"a$i") ++ shared ++
        (11 to 20).map(i => s"b$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextDedup.repeatedSpans(docs, "doc_id", "text", windowTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 4L, 24L, 6L), (2L, 10L, 30L, 6L)), got.toSeq)
    // two repeats closer than one window merge into one conservative span
    val near = Seq(
      (1L, ((1 to 20).map(i => s"p$i") ++ (1 to 5).map(i => s"m$i") ++
        (1 to 20).map(i => s"q$i")).mkString(" ")),
      (2L, ((1 to 20).map(i => s"p$i") ++ (1 to 5).map(i => s"n$i") ++
        (1 to 20).map(i => s"q$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val merged = TextDedup.repeatedSpans(near, "doc_id", "text", windowTokens = 15)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // p-block spans [0,20), q-block spans [25,45): gap between last
    // p-window start (5) and first q-window start (25) is 20 > 15, so
    // they stay SEPARATE spans here; each doc reports both
    assert(merged.length == 4, merged.toSeq)
    assert(merged.toSet == Set((1L, 0L, 20L), (1L, 25L, 45L),
      (2L, 0L, 20L), (2L, 25L, 45L)), merged.toSeq)
  }

  test("removeRepeatedSpans: canonical occurrence survives, others excised") {
    val spark0 = spark
    import spark0.implicits._
    // docs 2 and 3 repeat a 20-token block; doc 1 is clean. Spans: doc 2
    // [10, 30), doc 3 [0, 20) — same content hash, so doc 2 (min doc_id)
    // keeps its copy and doc 3 loses tokens 0..19.
    val shared = (1 to 20).map(i => s"s$i")
    val docs = Seq(
      (1L, (1 to 25).map(i => s"u$i").mkString(" ")),
      (2L, ((1 to 10).map(i => s"a$i") ++ shared ++
        (1 to 5).map(i => s"b$i")).mkString(" ")),
      (3L, (shared ++ (1 to 12).map(i => s"c$i")).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextDedup.removeRepeatedSpans(docs, "doc_id", "text",
        windowTokens = 15)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == ((1 to 25).map(i => s"u$i").mkString(" "), 0L))
    assert(got(2L)._1 == ((1 to 10).map(i => s"a$i") ++ shared ++
      (1 to 5).map(i => s"b$i")).mkString(" "))
    assert(got(2L)._2 == 0L)
    assert(got(3L) == ((1 to 12).map(i => s"c$i").mkString(" "), 20L), got(3L))
    // a doc that is pure boilerplate comes back empty, not missing
    val allBoiler = Seq(
      (1L, shared.mkString(" ")),
      (2L, shared.mkString(" ")))
      .toDF("doc_id", "text")
    val gb = TextDedup.removeRepeatedSpans(allBoiler, "doc_id", "text", 15)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(gb(1L) == (shared.mkString(" "), 0L))
    assert(gb(2L) == ("", 20L))
  }

  test("overlapStitchPairs finds tail=head splits at the widest level") {
    val spark0 = spark
    import spark0.implicits._
    val chunk = "abcdefghijklmnop" // 16 chars
    val a = chunk * 5              // 80 chars; tail-64 = chunk*4
    val b = chunk * 4 + "zzzzzzzzzzzzzzzz" * 3 // head-64 = chunk*4
    val c = chunk + "q" * 64       // head-16 = chunk only
    val docs = Seq((1L, a), (2L, b), (3L, c),
      (4L, "completely unrelated text padded to sixty-four characters!!....."))
      .toDF("doc_id", "text")
    val got = TextDedup.overlapStitchPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // a's tail-64 == b's head-64 → 64; a's tail-16 == c's head-16 only → 16
    assert(got((1L, 2L)) == 64L)
    assert(got((1L, 3L)) == 16L)
    // a's own tail matches its own head-16 but self-pairs are excluded
    assert(!got.contains((1L, 1L)) && !got.keys.exists(_._2 == 4L))
  }

  test("fuzzyPrefixPairs: blocking, distance gate, and the block cap") {
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the hazy dog today"),   // 1 sub in prefix
      (3L, "the quick brown cat sleeps all day long"),             // same block, far
      (4L, "a completely different text altogether")               // different block
    ).toDF("doc_id", "text")
    val got = TextDedup.fuzzyPrefixPairs(docs, "doc_id", "text",
        blockLen = 12, prefixLen = 40, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L)))
    // cap: a block larger than maxBlock produces no pairs at all
    val flood = (1L to 10L).map(i => (i, s"same same same prefix doc $i"))
      .toDF("doc_id", "text")
    val capped = TextDedup.fuzzyPrefixPairs(flood, "doc_id", "text",
      blockLen = 12, prefixLen = 40, maxDist = 30, maxBlock = 5)
    assert(capped.isEmpty)
    val uncapped = TextDedup.fuzzyPrefixPairs(flood, "doc_id", "text",
      blockLen = 12, prefixLen = 40, maxDist = 30, maxBlock = 100)
    assert(uncapped.count() == 45L) // 10 choose 2
  }
}
