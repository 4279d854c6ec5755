package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Audio-frame energy: hand-computed energies on a known byte string,
  * frame geometry, and the empty-payload guard.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("audioFrameEnergy computes per-frame energy/peak over byte samples") {
    // bytes 65,66 → s = -63,-62; energy = 63²+62² = 7813, peak 63
    val got = Multimodal.audioFrameEnergy(
        Seq((1L, Array[Byte](65, 66))).toDF("doc_id", "payload"),
        "doc_id", "payload", frameBytes = 64)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 2L, 63L * 63 + 62L * 62, 63L)))
  }

  test("audioFrameEnergy reads the full 0-255 byte range (true binary)") {
    // bytes 0 and 255 — both outside 7-bit ASCII, where a text proxy
    // breaks: s = -128 and 127, energy = 128² + 127², peak 128
    val got = Multimodal.audioFrameEnergy(
        Seq((3L, Array[Byte](0, -1))).toDF("doc_id", "payload"),
        "doc_id", "payload", frameBytes = 64)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 0L, 2L, 128L * 128 + 127L * 127, 128L)))
  }

  test("audioFrameEnergy kernel equals the relational per-sample form") {
    // r14: the per-frame stats moved from a per-byte explode + regroup to
    // the codegen'd GraftByteOps.frameEnergies kernel — pin row-for-row
    // equality against the relational formulation on payloads with
    // partial tail frames, exact-multiple lengths, and full byte range.
    val docs = Seq(
      (1L, Array.tabulate(200)(j => ((j * 37 + 3) % 256).toByte)),
      (2L, Array.tabulate(128)(j => ((255 - j) % 256).toByte)),
      (3L, Array.tabulate(65)(j => ((j * j) % 256).toByte)),
      (4L, Array[Byte]())).toDF("doc_id", "payload")
    val got = Multimodal.audioFrameEnergy(docs, "doc_id", "payload", 64)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val ref = docs.filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"),
        explode(expr("sequence(1L, cast(octet_length(payload) as bigint))")).as("pos"),
        col("payload"))
      .select(col("doc_id"), expr("(pos - 1) div 64").as("frame_idx"),
        (expr("cast(conv(hex(substring(payload, cast(pos as int), 1)), 16, 10) as int)") - 128)
          .cast("long").as("s"))
      .groupBy("doc_id", "frame_idx")
      .agg(count(lit(1)).cast("long").as("n_samples"),
        sum(col("s") * col("s")).cast("long").as("energy"),
        max(abs(col("s"))).cast("long").as("peak"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got === ref)
  }

  test("syntheticPcm generates the documented byte formula as true binary") {
    val pcm = Multimodal.syntheticPcm(
        Seq(Tuple1(42L)).toDF("doc_id"), "doc_id")
      .select("payload").as[Array[Byte]].head()
    val n = 200 + 42 % 300
    assert(pcm.length == n)
    for (j <- 0 until n) {
      val expect = ((42L * 31 + j.toLong * j * 7 + j * 13) % 256).toByte
      assert(pcm(j) == expect, s"byte $j: got ${pcm(j)}, want $expect")
    }
    // the formula must actually exercise beyond-ASCII byte values
    assert(pcm.exists(b => (b & 0xff) > 127))
  }

  test("audioFrameEnergy splits frames at frameBytes boundaries") {
    val payload = Array.fill[Byte](5)(-128) // byte 128 → s = 0 everywhere
    val got = Multimodal.audioFrameEnergy(
        Seq((7L, payload)).toDF("doc_id", "payload"), "doc_id", "payload",
        frameBytes = 2)
      .orderBy("frame_idx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // 5 samples at frame size 2 → frames of 2,2,1 samples, all zero energy
    assert(got == Seq((7L, 0L, 2L, 0L, 0L), (7L, 1L, 2L, 0L, 0L),
      (7L, 2L, 1L, 0L, 0L)))
  }

  test("audioFrameEnergy drops empty payloads") {
    val got = Multimodal.audioFrameEnergy(
      Seq((1L, Array.empty[Byte]), (2L, Array[Byte]('Q')))
        .toDF("doc_id", "payload"), "doc_id", "payload")
    assert(got.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("areaDownscale: exact box averages, partial edge blocks, drops") {
    val spark0 = spark
    import spark0.implicits._
    // id 2: w = 8+2%5 = 10, h = 8+2%7 = 10 → factor-3 output 4x4 with
    // partial right/bottom blocks (10 = 3+3+3+1)
    val pngs = Multimodal.syntheticPngs(Seq(java.lang.Long.valueOf(2L)).toDS())
    val got = Multimodal.areaDownscale(pngs, factor = 3).collect().head
    def luma(x: Int, y: Int) = ((2L * 31 + x * 7 + y * 13) % 256).toInt
    var sum = 0L
    var checksum = 0L
    for (oy <- 0 until 4; ox <- 0 until 4) {
      val xs = (ox * 3) until math.min(ox * 3 + 3, 10)
      val ys = (oy * 3) until math.min(oy * 3 + 3, 10)
      val v = xs.flatMap(x => ys.map(y => luma(x, y).toLong)).sum /
        (xs.size * ys.size)
      sum += v
      checksum += v * (1L + ox + 17L * oy)
    }
    assert(got.width == 10 && got.height == 10)
    assert(got.out_w == 4 && got.out_h == 4)
    assert(got.sum_resized == sum)
    assert(got.pixel_checksum == checksum)
    // undecodable payloads drop, like every decode stage
    val junk = Seq(Multimodal.MediaRow(5L, Array[Byte](1, 2, 3))).toDS()
    assert(Multimodal.areaDownscale(junk, 2).collect().isEmpty)
  }

  test("lengthBucketReport: bucket geometry and exact pad-waste ppm") {
    // token counts: 3, 3, 70 → buckets 0 (two docs) and 1 (one doc)
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f"),
      (3L, Seq.fill(70)("w").mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.lengthBucketReport(docs, "text", bucketTokens = 64)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // bucket 0: 2 docs, max 3, sum 6 → waste (2·3-6)/6 = 0 ppm
    // bucket 1: 1 doc, max 70, sum 70 → 0 ppm
    assert(got == Seq((0L, 2L, 3L, 6L, 0L), (1L, 1L, 70L, 70L, 0L)))
    val mixed = TextAnalysis.lengthBucketReport(
        Seq((1L, "a b c d"), (2L, "e f")).toDF("doc_id", "text"), "text",
        bucketTokens = 64)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // one bucket: 2 docs, max 4, sum 6 → waste (8-6)·1e6 div 8 = 250000
    assert(mixed == Seq((0L, 2L, 4L, 6L, 250000L)))
  }

  test("chunked payloadChecksum equals the byte fold and the Scala law") {
    val spark0 = spark
    import spark0.implicits._
    // sizes straddle every chunk regime: empty, sub-chunk, exactly one
    // chunk, chunk+1, exact multi-chunk multiple, and a multi-chunk
    // irregular tail; bytes span the full signed range incl. 0x00/0xff
    val sizes = Seq(0, 1, 100, 4095, 4096, 4097, 8192, 20000)
    val rows = sizes.zipWithIndex.map { case (n, id) =>
      (id.toLong, Array.tabulate[Byte](n)(j => ((id * 31 + j * j * 7 + j * 13) % 256).toByte))
    }
    def ref(bytes: Array[Byte]): Long =
      bytes.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    val df = rows.toDF("doc_id", "payload")
    val got = df.select(col("doc_id"),
        Multimodal.payloadChecksum("payload").as("chunked"),
        Multimodal.payloadChecksumByteFold("payload").as("flat"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    for (((id, chunked, flat), i) <- got.zipWithIndex) {
      assert(id == i.toLong)
      assert(chunked === flat, s"size ${sizes(i)}")
      assert(chunked === ref(rows(i)._2), s"size ${sizes(i)} vs scala ref")
    }
  }
}
