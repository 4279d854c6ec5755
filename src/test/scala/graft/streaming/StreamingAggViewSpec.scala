package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingAggView.GroupDelta

/** Integer-additive state is commutative + associative, so any arrival
  * order and any micro-batch split must converge to the batch sum — the
  * streaming twin of Cdc.aggViewMaintain's DECIMAL-exact merge.
  */
class StreamingAggViewSpec extends SparkSpec {

  private def deltas: Seq[GroupDelta] = {
    val rnd = new scala.util.Random(7)
    // inserts, value changes (remove old + add new), deletes across 6
    // groups — including one group whose count returns to zero
    val base = (for (g <- 0L until 6L; i <- 0 until 8) yield {
      val v = (g * 31 + i * 17) % 100 * 1000000L
      Seq(GroupDelta(g, v, 1L)) ++
        (if (i % 3 == 0) Seq(GroupDelta(g, -v, -1L),
          GroupDelta(g, v + 500000L, 1L)) else Nil)
    }).flatten ++
      // drain group 5 entirely: remove exactly what is resident (the
      // i%3==0 slots hold the moved value, the rest the original)
      (0 until 8).map { i =>
        val v = (5L * 31 + i * 17) % 100 * 1000000L
        val resident = if (i % 3 == 0) v + 500000L else v
        GroupDelta(5L, -resident, -1L)
      }
    rnd.shuffle(base)
  }

  test("streaming view state across shuffled micro-batches equals the batch sum") {
    val spark0 = spark
    import spark0.implicits._
    val ds = deltas
    val expected = ds.groupBy(_.g).map { case (g, xs) =>
      g -> ((xs.map(_.dn).sum, xs.map(_.dvMicros).sum))
    }
    val in = MemoryStream[GroupDelta](spark)
    val q = StreamingAggView.viewStream(in.toDS())
      .writeStream.format("memory").queryName("aggview_stream")
      .outputMode("update").start()
    try {
      val (a, rest) = ds.splitAt(ds.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData(c); q.processAllAvailable()
      // memory sink in update mode appends every emission; the LAST row
      // per group is the final state
      val fin = spark.table("aggview_stream")
        .as[(Long, Long, Long)].collect().zipWithIndex
        .groupBy(_._1._1).map { case (g, rows) => g -> rows.maxBy(_._2)._1 }
      for ((g, (n, s)) <- expected) {
        assert(fin(g) === ((g, n, s)), s"group $g")
      }
      // the drained group reports the zero tombstone
      assert(expected(5L)._1 === 0L && fin(5L)._2 === 0L)
    } finally q.stop()
  }

  test("inconsistent drain (n=0, s!=0) keeps its residual state instead of dropping it") {
    val spark0 = spark
    import spark0.implicits._
    val in = MemoryStream[GroupDelta](spark)
    val q = StreamingAggView.viewStream(in.toDS())
      .writeStream.format("memory").queryName("aggview_residual")
      .outputMode("update").start()
    try {
      // malformed feed: count returns to zero but 100 micros linger
      in.addData(GroupDelta(1L, 1000000L, 1L), GroupDelta(1L, -999900L, -1L))
      q.processAllAvailable()
      // re-insertion must resume FROM the residual, not from (0, 0)
      in.addData(GroupDelta(1L, 500L, 1L))
      q.processAllAvailable()
      val last = spark.table("aggview_residual")
        .as[(Long, Long, Long)].collect().last
      assert(last === ((1L, 1L, 600L)))
      // a consistent drain still removes state: re-insertion starts fresh
      in.addData(GroupDelta(2L, 7L, 1L), GroupDelta(2L, -7L, -1L))
      q.processAllAvailable()
      in.addData(GroupDelta(2L, 9L, 1L))
      q.processAllAvailable()
      val g2 = spark.table("aggview_residual")
        .as[(Long, Long, Long)].collect().filter(_._1 == 2L).last
      assert(g2 === ((2L, 1L, 9L)))
    } finally q.stop()
  }
}
