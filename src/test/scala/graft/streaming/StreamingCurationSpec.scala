package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{TextAnalysis, TextDedup}

class StreamingCurationSpec extends SparkSpec {

  test("ingest-time curation equals the batch gate+dedup across micro-batches") {
    val spark0 = spark
    import spark0.implicits._
    val minQ = 0.3
    val corpus = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1) // ingest in id order => first-arrival == min-id
    val in = MemoryStream[(Long, String)](spark)
    val q = StreamingCuration.firstSeenStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", minQ)
      .writeStream.format("memory").queryName("curated_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cur-ck").toString)
      .outputMode("append").start()
    try {
      // three micro-batches; duplicates recur within and across batches
      val (b1, rest) = corpus.splitAt(corpus.length / 3)
      val (b2, b3) = rest.splitAt(rest.length / 3)
      for (b <- Seq(b1, b2 ++ b1.take(5), b3 ++ b2.take(5))) {
        in.addData(b.toIndexedSeq)
        q.processAllAvailable()
      }
      val streamed = spark.table("curated_stream")
        .select("doc_id").as[Long].collect().toSet

      // batch reference: quality gate then exact-dedup min-id survivors
      val gated = graft.Tables.documents(spark, sfDir)
        .filter(TextAnalysis.qualityScore(col("text")) >= minQ)
      val batchKeep = TextDedup.exactGroups(gated, "doc_id", "text")
        .select("keep_id").as[Long].collect().toSet
      assert(streamed == batchKeep)
      // and every duplicate re-arrival was suppressed: one row per hash
      val hashes = spark.table("curated_stream")
        .groupBy("text_hash").count().filter(col("count") > 1).count()
      assert(hashes == 0)
    } finally q.stop()
  }
}
