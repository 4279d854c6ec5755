package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sliding-window chunking: coverage (every character appears in some
  * chunk), overlap geometry, and the short-document floor of one chunk.
  */
class PackingChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunks(text: String) =
    Packing.chunkDocuments(Seq((1L, text)).toDF("id", "text"),
        "text", size = 10, stride = 7)
      .select("chunk_idx", "chunk_start", "chunk_text")
      .as[(Int, Long, String)].collect().sortBy(_._1).toSeq

  test("short document yields exactly one whole-text chunk") {
    assert(chunks("abc") == Seq((0, 0L, "abc")))
    assert(chunks("0123456789") == Seq((0, 0L, "0123456789")))
  }

  test("windows advance by stride with size-stride overlap") {
    val text = "abcdefghijklmnopqrstuvwxyz" // 26 chars
    val got = chunks(text)
    // last start = ceil((26-10)/7)*7 = 21 → chunks at 0,7,14,21
    assert(got.map(_._2) == Seq(0L, 7L, 14L, 21L))
    assert(got.map(_._3) == Seq("abcdefghij", "hijklmnopq",
      "opqrstuvwx", "vwxyz"))
    // coverage: concatenating stride-prefixes + last chunk restores text
    val rebuilt = got.dropRight(1).map(_._3.take(7)).mkString + got.last._3
    assert(rebuilt == text)
  }

  test("stride == size gives disjoint exhaustive chunks") {
    val got = Packing.chunkDocuments(
        Seq((1L, "abcdefghijkl")).toDF("id", "text"), "text", 5, 5)
      .select("chunk_text").as[String].collect().toSeq.sorted
    assert(got.sorted == Seq("abcde", "fghij", "kl").sorted)
    assert(got.mkString.length == 12)
  }
}
