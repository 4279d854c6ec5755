package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class TsVal(ts: Timestamp, v: Double)

/** The streaming quantile twin's two documented regimes against the
  * batch form:
  *  - below `accuracy` observations per window the sketch compresses
  *    nothing → the streamed answer EQUALS the batch `percentile_approx`
  *    of the same window AND is the exact order statistic;
  *  - at forced compression the answer stays within the documented rank
  *    bound ⌈n/accuracy⌉ of the target rank.
  * Windows must emit exactly once (append mode, watermark-finalized).
  */
class StreamingPercentilesSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("small windows: streamed quantiles equal batch and the exact order statistic") {
    val spark0 = spark
    import spark0.implicits._
    val rng = new scala.util.Random(13)
    // two 60s windows, ~80 values each (<< accuracy → lossless summary)
    val w1 = (0 until 80).map(i => TsVal(ts(60 + i % 50), rng.nextInt(1000) / 4.0))
    val w2 = (0 until 75).map(i => TsVal(ts(120 + i % 55), rng.nextInt(1000) / 4.0))
    val sentinel = TsVal(ts(100000), 0.0) // pushes the watermark past both
    val ps = Seq(0.1, 0.5, 0.9)
    val in = MemoryStream[TsVal](spark)
    // the shuffled feed interleaves both windows across batches, so the
    // watermark delay must cover the full disorder span (120 s) or the
    // second batch's older events arrive late and drop
    val q = StreamingPercentiles.windowedQuantiles(in.toDF(), "ts", "v",
        "60 seconds", "120 seconds", ps, accuracy = 10000)
      .writeStream.format("memory").queryName("pct_stream")
      .outputMode("append").start()
    try {
      val (a, b) = rng.shuffle(w1 ++ w2).splitAt(70)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData(Seq(sentinel)); q.processAllAvailable()
      val got = spark.table("pct_stream")
        .as[(Timestamp, Long, Seq[Double])].collect()
        .map(r => r._1.getTime / 1000 -> ((r._2, r._3))).toMap
      assert(got.keySet === Set(60L, 120L)) // sentinel's window not closed
      for ((start, vals) <- Seq(60L -> w1, 120L -> w2)) {
        val (n, qs) = got(start)
        assert(n === vals.length)
        // batch twin over the same static window
        val batch = vals.toDF("ts", "v")
          .agg(expr(s"percentile_approx(v, array(${ps.mkString(", ")}), 10000)"))
          .as[Seq[Double]].collect().head
        assert(qs === batch, s"window $start: stream vs batch")
        // lossless regime ⇒ exact order statistic rank ⌈p·n⌉
        val sorted = vals.map(_.v).sorted
        for ((p, i) <- ps.zipWithIndex) {
          val rank = math.max(1, math.ceil(p * n).toInt)
          assert(qs(i) === sorted(rank - 1),
            s"window $start p=$p: ${qs(i)} vs exact ${sorted(rank - 1)}")
        }
      }
    } finally q.stop()
  }

  test("forced compression honors the documented rank bound") {
    val spark0 = spark
    import spark0.implicits._
    val rng = new scala.util.Random(17)
    val n = 5000
    val accuracy = 50 // rank error bound ceil(n/a) = 100
    val vals = (0 until n).map(i => TsVal(ts(60 + i % 59), rng.nextDouble() * 1e4))
    val in = MemoryStream[TsVal](spark)
    val ps = Seq(0.25, 0.5, 0.95)
    val q = StreamingPercentiles.windowedQuantiles(in.toDF(), "ts", "v",
        "60 seconds", "0 seconds", ps, accuracy)
      .writeStream.format("memory").queryName("pct_stream_lo")
      .outputMode("append").start()
    try {
      vals.grouped(1700).foreach { batch =>
        in.addData(batch); q.processAllAvailable()
      }
      in.addData(Seq(TsVal(ts(100000), 0.0))); q.processAllAvailable()
      val row = spark.table("pct_stream_lo")
        .as[(Timestamp, Long, Seq[Double])].collect()
        .find(_._1.getTime == 60000L).get
      assert(row._2 === n.toLong)
      val sorted = vals.map(_.v).sorted
      val bound = math.ceil(n.toDouble / accuracy).toLong
      for ((p, i) <- ps.zipWithIndex) {
        val v = row._3(i)
        // the returned value must be an observed value whose rank is
        // within `bound` of the target rank
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        assert(lo >= 1, s"p=$p: $v not an observed value")
        val target = math.max(1, math.ceil(p * n).toInt)
        assert(target >= lo - bound && target <= hi + bound,
          s"p=$p: value rank [$lo,$hi] vs target $target bound $bound")
      }
    } finally q.stop()
  }
}
