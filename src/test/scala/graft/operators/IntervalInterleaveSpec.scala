package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interval-overlap join (pair uniqueness, closed bounds, bucket
  * spanning) and corpus interleaving (permutation, proportional spread).
  */
class IntervalInterleaveSpec extends SparkSpec {
  import spark.implicits._

  private def overlaps(left: Seq[(Long, Long, Long)],
                       right: Seq[(Long, Long, Long)], bucket: Long) =
    RangeJoin.intervalOverlap(
        left.toDF("l_id", "ls", "le"), right.toDF("r_id", "rs", "re"),
        "ls", "le", "rs", "re", bucket)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted

  test("intervalOverlap emits each overlapping pair exactly once") {
    // left interval spans many buckets; right overlaps it across several
    // bucket boundaries — without the first-overlap-bucket filter this
    // pair would appear once per shared bucket
    val got = overlaps(
      Seq((1L, 0L, 1000L)), Seq((9L, 100L, 900L)), bucket = 10L)
    assert(got == Seq((1L, 9L)))
  }

  test("intervalOverlap honors closed bounds and excludes disjoint pairs") {
    val got = overlaps(
      Seq((1L, 0L, 100L), (2L, 500L, 600L)),
      Seq((7L, 100L, 200L), (8L, 601L, 700L)), bucket = 64L)
    // 1-7 touch at t=100 (closed bounds => overlap); 2-8 are disjoint
    assert(got == Seq((1L, 7L)))
  }

  test("intervalOverlap matches the quadratic reference on random data") {
    val rng = new scala.util.Random(11)
    val l = (1 to 40).map(i =>
      (i.toLong, rng.nextInt(1000).toLong, 0L)).map {
      case (i, s, _) => (i, s, s + rng.nextInt(200).toLong) }
    val r = (1 to 40).map(i =>
      (i.toLong, rng.nextInt(1000).toLong, 0L)).map {
      case (i, s, _) => (i, s, s + rng.nextInt(200).toLong) }
    val expected = for {
      (li, ls, le) <- l
      (ri, rs, re) <- r
      if ls <= re && rs <= le
    } yield (li, ri)
    assert(overlaps(l, r, bucket = 128L) == expected.sorted)
  }

  test("knnGraph gives every node at most k bucket-mate edges, exact") {
    val emb = spark.createDataFrame(
      (0L until 20L).map(i => (i, Array.tabulate(4)(j =>
        math.sin(i * 3.7 + j).toFloat)))).toDF("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") % 5 === 0)
    val assign = Ann.ivfAssign(emb, cents,
      "vec_id", "embedding", "vec_id", "embedding")
    val got = Ann.knnGraph(emb, assign, "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSeq
    val perNode = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perNode.values.forall(_ <= 2))
    assert(got.forall { case (q, n, _) => q != n })
    // spot-check one bucket by brute force: edges of a node are its
    // 2 highest-cosine bucket-mates
    val rows = emb.join(assign, "vec_id")
      .select("vec_id", "embedding", "centroid_id")
      .as[(Long, Array[Float], Long)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    for ((q, qv, c) <- rows.take(5)) {
      val mates = rows.filter(r => r._3 == c && r._1 != q)
      val want = mates.map(r => (cos(qv, r._2), r._1))
        .sortBy { case (s, id) => (-s, id) }.take(2).map(_._2).toSeq
      val have = got.filter(_._1 == q).sortBy(_._3).map(_._2)
      assert(have == want, s"node $q")
    }
  }

  test("corpusInterleave: positions are a permutation and sources alternate") {
    val docs = ((1 to 4).map(i => (i.toLong, "a")) ++
      (5 to 8).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val got = Packing.corpusInterleave(docs, "doc_id", "source")
      .select("doc_id", "source", "src_rank", "train_pos")
      .as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._4)
    assert(got.map(_._4) == (1L to 8L))
    // equal counts => fractions tie and the source index breaks them:
    // strict a/b alternation
    assert(got.map(_._2) == Seq("a", "b", "a", "b", "a", "b", "a", "b"))
    // within a source, later ranks land later in the schedule
    for (s <- Seq("a", "b")) {
      val pos = got.filter(_._2 == s).sortBy(_._3).map(_._4)
      assert(pos == pos.sorted)
    }
  }

  test("corpusInterleave spreads a minority source evenly") {
    val docs = ((1 to 30).map(i => (i.toLong, "big")) ++
      Seq((100L, "small"), (101L, "small"), (102L, "small")))
      .toDF("doc_id", "source")
    val got = Packing.corpusInterleave(docs, "doc_id", "source")
      .select("source", "train_pos").as[(String, Long)].collect().toSeq
    val smallPos = got.filter(_._1 == "small").map(_._2).sorted
    // 3 docs over 33 positions: one per third of the schedule
    assert(smallPos.size == 3)
    assert(smallPos(0) <= 11 && smallPos(1) >= 12 && smallPos(1) <= 22 &&
      smallPos(2) >= 23, s"positions $smallPos")
  }
}
