package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Span-corruption masks: geometric invariants (in-bounds, non-overlap,
  * one span per gap), noise-density tracking, and the short-doc floor.
  */
class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private def masks(docs: Seq[(Long, String)]) =
    Packing.spanCorruptionMasks(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("docs under the noise floor produce no masks") {
    // 6 tokens → n_masked = 0
    assert(masks(Seq((1L, "a b c d e f"))).isEmpty)
    // 7 tokens → n_masked = 1, one span
    val got = masks(Seq((2L, "a b c d e f g")))
    assert(got.size == 1)
  }

  test("spans stay in bounds, never overlap, one per gap") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ") // 100 tokens
    val got = masks(Seq((5L, text))).sortBy(_._3)
    // 100 tokens → 15 masked → 5 spans, gap 20
    assert(got.size == 5)
    for (((_, sid, start, len), i) <- got.zipWithIndex) {
      assert(sid == i)
      assert(len >= 1 && len <= 4)
      assert(start >= i * 20 && start + len <= (i + 1) * 20,
        s"span $sid [$start, ${start + len}) escapes gap $i")
    }
    // non-overlap across consecutive spans
    got.sliding(2).foreach {
      case Seq((_, _, s1, l1), (_, _, s2, _)) => assert(s1 + l1 <= s2)
      case _ =>
    }
  }

  test("masked fraction tracks the 15% noise density") {
    val text = (1 to 400).map(i => s"w$i").mkString(" ")
    val got = masks(Seq((9L, text)))
    val maskedTokens = got.map(_._4).sum
    // 400 tokens → n_masked = 60, 20 spans of mean 3: hash-picked lengths
    // in {2,3,4} sum near 60
    assert(got.size == 20)
    assert(maskedTokens >= 40 && maskedTokens <= 80, s"masked $maskedTokens")
  }

  test("masks are deterministic across reruns") {
    val docs = Seq((1L, (1 to 50).map("x" + _).mkString(" ")),
      (2L, (1 to 31).map("y" + _).mkString(" ")))
    assert(masks(docs).sortBy(r => (r._1, r._2)) ==
      masks(docs).sortBy(r => (r._1, r._2)))
  }
}
