package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingLww.{CellOut, CellUpdate}

/** The LWW merge is commutative + associative, so any arrival order and
  * any micro-batch split must converge to the batch reduction — the
  * property that makes at-least-once replay harmless.
  */
class StreamingLwwSpec extends SparkSpec {

  private def updates: Seq[CellUpdate] = {
    // 10 keys x 2 cells x several competing writes, incl. writetime ties
    val rnd = new scala.util.Random(42)
    val base = for {
      pk <- 0L until 10L
      cell <- Seq("price", "prio")
      i <- 0 until 5
    } yield CellUpdate(pk, cell, s"v${(pk * 31 + i * 7) % 13}",
      (pk + i * 3) % 11)
    rnd.shuffle(base)
  }

  private def batchReduce(us: Seq[CellUpdate]): Map[(Long, String), (String, Long)] =
    us.groupBy(u => (u.pk, u.cell)).map { case (k, g) =>
      val (w, v) = g.map(u => (u.writetime, u.value)).max
      k -> ((v, w))
    }

  test("streaming state across shuffled micro-batches equals the batch fold") {
    val spark0 = spark
    import spark0.implicits._
    val us = updates
    val in = MemoryStream[CellUpdate](spark)
    val q = StreamingLww.mergedCellStream(in.toDS())
      .writeStream.format("memory").queryName("lww_stream")
      .outputMode("update").start()
    try {
      // three uneven micro-batches
      val (a, rest) = us.splitAt(us.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData(c); q.processAllAvailable()
    } finally q.stop()
    // last emitted row per (pk, cell) is the converged state
    val streamed = spark.table("lww_stream").as[CellOut].collect()
      .zipWithIndex
      .groupBy(t => (t._1.pk, t._1.cell))
      .map { case (k, g) =>
        val last = g.maxBy(_._2)._1
        k -> ((last.value, last.writetime))
      }
    assert(streamed == batchReduce(us))
  }

  test("replays are harmless: feeding every update twice changes nothing") {
    val spark0 = spark
    import spark0.implicits._
    val us = updates
    val in = MemoryStream[CellUpdate](spark)
    val q = StreamingLww.mergedCellStream(in.toDS())
      .writeStream.format("memory").queryName("lww_replay")
      .outputMode("update").start()
    try {
      in.addData(us); q.processAllAvailable()
      in.addData(us.reverse); q.processAllAvailable() // full replay
    } finally q.stop()
    val streamed = spark.table("lww_replay").as[CellOut].collect()
      .zipWithIndex
      .groupBy(t => (t._1.pk, t._1.cell))
      .map { case (k, g) =>
        val last = g.maxBy(_._2)._1
        k -> ((last.value, last.writetime))
      }
    assert(streamed == batchReduce(us))
  }
}
