package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** MV maintenance is a stateless per-change map, so (a) any micro-batch
  * split yields the same mutation multiset, and (b) feeding the batch
  * snapshot join through the same derivation must equal Cdc.mvMaintain.
  */
final case class Change(id: Long, old_vk: java.lang.Long,
                        old_ts: java.lang.Long, new_vk: java.lang.Long,
                        new_ts: java.lang.Long)

class StreamingMvSpec extends SparkSpec {

  private val changes = Seq(
    Change(1L, null, null, 10L, 100L),   // insert
    Change(2L, 20L, 200L, null, null),   // delete
    Change(3L, 30L, 300L, 30L, 301L),    // update, key same
    Change(4L, 40L, 400L, 41L, 401L),    // key move → delete + insert
    Change(5L, 50L, 500L, 50L, 500L)     // unchanged → nothing
  )

  private def expected = Set(
    ("insert", 10L, 1L, 100L),
    ("delete", 20L, 2L, 200L),
    ("update", 30L, 3L, 301L),
    ("delete", 40L, 4L, 400L), ("insert", 41L, 4L, 401L))

  test("streaming view mutations across micro-batches equal the batch set") {
    val spark0 = spark
    import spark0.implicits._
    val in = MemoryStream[Change](spark)
    val q = StreamingMv.viewMutations(in.toDF(), "id")
      .writeStream.format("memory").queryName("mv_stream")
      .outputMode("append").start()
    try {
      val (a, b) = changes.splitAt(2)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      val got = spark.table("mv_stream")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("the same derivation over a batch frame equals Cdc.mvMaintain") {
    val spark0 = spark
    import spark0.implicits._
    val feed = changes.toDF()
    val streamed = StreamingMv.viewMutations(feed, "id")
      .as[(String, Long, Long, Long)].collect().toSet
    // reconstruct the two snapshots the feed encodes and run the batch op
    val prev = feed.filter(col("old_ts").isNotNull)
      .select(col("id"), col("old_vk").as("vk"), col("old_ts").as("ts"))
    val curr = feed.filter(col("new_ts").isNotNull)
      .select(col("id"), col("new_vk").as("vk"), col("new_ts").as("ts"))
    val batch = Cdc.mvMaintain(prev, curr, Seq("id"), "vk")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
    assert(batch === expected)
  }
}
