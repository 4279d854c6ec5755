package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextDedup
import graft.streaming.StreamingDedup.{CandidatePair, DocIn}

class StreamingDedupSpec extends SparkSpec {

  private val n = 3
  private val numPerm = 128
  private val bands = 32

  test("MinHashJvm band keys equal the relational MinHashAgg band keys") {
    val docs = graft.Tables.documents(spark, sfDir)
    val relational = TextDedup.shingleHashTable(docs, "doc_id", "text", n)
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.graft.MinHashAggFunctions
        .minhashBandKeys(col("h"), numPerm, bands).as("bk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val local = docs.select("doc_id", "text").collect().map { r =>
      r.getLong(0) -> org.apache.spark.sql.graft.MinHashJvm.bandKeys(
        org.apache.spark.sql.graft.MinHashJvm.shingleHashes(r.getString(1), n),
        numPerm, bands).toSeq
    }.toMap
    assert(local == relational)
  }

  test("streaming candidates across micro-batches equal the batch self-join") {
    val spark0 = spark
    import spark0.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => DocIn(r.getLong(0), r.getString(1)))
    val in = MemoryStream[DocIn](spark)
    val q = StreamingDedup.lshCandidateStream(in.toDS(), n, numPerm, bands,
        maxBucket = 1000)
      .writeStream.format("memory").queryName("lsh_stream")
      .outputMode("append").start()
    try {
      val (first, second) = docs.splitAt(docs.length / 2)
      in.addData(first.toIndexedSeq)
      q.processAllAvailable()
      in.addData(second.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("lsh_stream").as[CandidatePair]
      .collect().map(p => (p.doc_a, p.doc_b)).toSet
    val batch = TextDedup.lshCandidatesFromHashes(
        TextDedup.shingleHashTable(
          graft.Tables.documents(spark, sfDir), "doc_id", "text", n),
        numPerm, bands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty) // the corpus contains near-dups
  }

  test("hot buckets stop emitting past the cap") {
    val spark0 = spark
    import spark0.implicits._
    // identical docs all collide in every bucket
    val clones = (1L to 10L).map(i => DocIn(i, "a b c d e f g h"))
    val in = MemoryStream[DocIn](spark)
    val q = StreamingDedup.lshCandidateStream(in.toDS(), n, numPerm, bands,
        maxBucket = 3)
      .writeStream.format("memory").queryName("lsh_capped")
      .outputMode("append").start()
    try { in.addData(clones); q.processAllAvailable() } finally q.stop()
    val pairs = spark.table("lsh_capped").as[CandidatePair]
      .collect().map(p => (p.doc_a, p.doc_b)).toSet
    // only the 3 admitted ids pair up: C(3,2) pairs, none beyond the cap
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
