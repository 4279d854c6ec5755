package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming face of [[graft.operators.Percentiles]] — the one analytics
  * shape the streaming module lacked.
  *
  * EXACT percentiles need the window's full value multiset: under a
  * stream that is unbounded state, so the streaming twin is the
  * ε-approximate quantile summary (`percentile_approx` — a mergeable
  * Greenwald-Khanna-style sketch whose per-window state is
  * O(accuracy·log n), checkpointable and commutative under any
  * micro-batch split).
  *
  * DOCUMENTED ERROR BOUND: with `accuracy` a, the returned value for
  * fraction p is an actual observed value whose RANK in the window's
  * sorted multiset lies within ⌈n/a⌉ positions of ⌈p·n⌉. Below a
  * observations per window the summary compresses nothing, so the
  * answer degenerates to the EXACT order statistic — both regimes are
  * spec-gated against the batch form ([[
  * graft.streaming.StreamingPercentilesSpec]] in tests).
  *
  * Tumbling event-time windows with a watermark: append mode emits each
  * window once, when the watermark passes its end — the standard
  * finalize-on-watermark contract every other windowed aggregate here
  * follows.
  */
object StreamingPercentiles {

  /** Per tumbling window: observation count and the approximate
    * quantile for each requested fraction (array-valued, one position
    * per `ps` entry).
    */
  def windowedQuantiles(events: DataFrame, tsCol: String, valueCol: String,
                        windowDuration: String, watermarkDelay: String,
                        ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      "fractions must lie in [0, 1]")
    require(accuracy >= 1, "accuracy must be positive")
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration).as("w"))
      .agg(count(lit(1)).as("n"),
        expr(s"percentile_approx($valueCol, array(${ps.mkString(", ")}), " +
          s"$accuracy)").as("quantiles"))
      .select(col("w.start").as("window_start"), col("n"), col("quantiles"))
  }
}
