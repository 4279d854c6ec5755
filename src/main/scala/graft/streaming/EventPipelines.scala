package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Event-stream pipelines with one semantic definition and two physical
  * forms: a batch DataFrame plan (what Verify/Bench run and the DuckDB
  * oracle checks) and a Structured Streaming form (watermarks + windowed
  * aggregation, mapGroupsWithState, flatMapGroupsWithState) proven
  * equivalent in EventPipelinesSpec via MemoryStream.
  *
  * Re-expresses the reference's continuous replication loop (per-tile
  * micro-batch discovery/replication, glue/sbin/keyspaces/
  * CQLReplicator.scala:1161-1215) as real Structured Streaming: the ledger
  * state machine becomes keyed state, the incremental stats become
  * windowed aggregates.
  */
object EventPipelines {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionOut(user_id: Long, session_start_s: Long,
                              session_end_s: Long, n_events: Long)

  final case class LatestOut(user_id: Long, event_type: String,
                             event_id: Long, value: Double)

  /** Epoch micros from a Timestamp without losing sub-millisecond digits
    * (getTime alone truncates to millis — the batch side compares full
    * microsecond event time).
    */
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  // --------------------------------------------------------- window agg

  /** Tumbling 1-hour per-type counts/sums. Works unchanged on a batch or
    * streaming DataFrame; decimal sum keeps the result partition-order
    * independent.
    */
  def windowAggCore(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming form: watermark bounds state; late events beyond 2 hours are
    * dropped and closed windows are finalized.
    */
  def windowAggStream(events: DataFrame): DataFrame =
    windowAggCore(events.withWatermark("ts", "2 hours"))

  /** HOPPING (sliding) 1-hour windows every 15 minutes — the smoothed
    * dashboard/alerting view a tumbling window can't give (a spike at a
    * window edge splits across two tumbling buckets; the 4 overlapping
    * hops always contain it whole). Each event lands in exactly
    * windowSize/slide = 4 windows; Spark's `window(ts, size, slide)`
    * generates them relationally — no self-join, one grouped aggregate,
    * 4× map-side row inflation that partial aggregation collapses.
    * Works unchanged on a batch or streaming DataFrame.
    */
  def hoppingAggCore(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  def hoppingAggStream(events: DataFrame): DataFrame =
    hoppingAggCore(events.withWatermark("ts", "2 hours"))

  // ------------------------------------------------- windowed CMS sketch

  /** Tumbling 1-hour count-min sketch of the user key + total: the
    * streaming half of the heavy-hitter pipeline (Sketches
    * .heavyHittersCms) — per-window state is ONE fixed depth×width
    * buffer regardless of key cardinality, merged additively across
    * micro-batches (commutative, so the streamed sketch is bit-equal to
    * the batch sketch over the same rows — spec-proven). A consumer
    * filters candidate keys against the published sketch and exact-counts
    * only those, exactly as in the batch form.
    */
  def cmsWindowCore(events: DataFrame, depth: Int = 4,
                    width: Int = 1024): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"))
      .agg(org.apache.spark.sql.graft.CountMinAggFunctions
          .countMinSketch(col("user_id").cast("long"), depth, width)
          .as("sketch"),
        count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("sketch"), col("n_events"))

  /** Streaming form of [[cmsWindowCore]]: the state store holds the
    * serialized sketch buffer per window.
    */
  def cmsWindowStream(events: DataFrame, depth: Int = 4,
                      width: Int = 1024): DataFrame =
    cmsWindowCore(events.withWatermark("ts", "2 hours"), depth, width)

  // ------------------------------------------------------- latest-per-key

  /** Batch: newest event per (user, type) — upsert/CDC compaction. Ordered
    * by (event time, event_id) so concurrent-timestamp ties are stable.
    */
  def latestPerKeyBatch(events: DataFrame): DataFrame =
    events.withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))

  /** Streaming form: keyed state holds the current winner; each micro-batch
    * folds its events into the state and emits the (possibly unchanged)
    * latest row — update-mode upsert semantics.
    */
  def latestPerKeyStream(events: Dataset[Event]): Dataset[LatestOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[Event, LatestOut](GroupStateTimeout.NoTimeout) {
        case ((uid, etype), it, state: GroupState[Event]) =>
          val newest = (state.getOption.iterator ++ it).maxBy(e => (tsMicros(e.ts), e.event_id))
          state.update(newest)
          LatestOut(uid, etype, newest.event_id, newest.value)
      }
  }

  // ------------------------------------------------- stream-static join

  /** Stream-static enrichment: a streaming fact joined to a slowly-changing
    * dimension DataFrame. The dim is re-read per micro-batch by Spark's
    * stream-static join machinery (no state), and a small dim broadcasts —
    * the enrich-on-ingest shape of the reference's field-mapping writes.
    * LEFT join by default: an event whose key hasn't reached the dim yet
    * (the normal late-dim race) must pass through un-enriched, not be
    * dropped from a replication path. Works unchanged on a batch `events`.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, keyCol: String,
                   joinType: String = "left"): DataFrame =
    events.join(broadcast(dim), Seq(keyCol), joinType)

  // ------------------------------------------------- stream-stream join

  /** Batch form of click→view attribution: every (click, view) pair of the
    * same user with the view inside the lookback window before the click.
    * (The as-of variant keeping only the latest view is operators.AsOf.)
    */
  def attributionBatch(clicks: DataFrame, views: DataFrame,
                       windowMinutes: Int): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
      col("ts").as("click_ts"))
    val v = views.select(col("event_id").as("view_id"),
      col("user_id").as("v_user_id"), col("ts").as("view_ts"))
    c.join(v,
        col("user_id") === col("v_user_id") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"interval $windowMinutes minutes"))
      .select("click_id", "user_id", "view_id")
  }

  /** Streaming form: watermarked stream-stream interval join — the time
    * bound lets Spark expire view-side state once the watermark passes the
    * lookback window, so state stays proportional to the window, not the
    * stream.
    */
  def attributionStream(clicks: DataFrame, views: DataFrame,
                        windowMinutes: Int): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val v = views.select(col("event_id").as("view_id"),
        col("user_id").as("v_user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    c.join(v,
        col("user_id") === col("v_user_id") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"interval $windowMinutes minutes"))
      .select("click_id", "user_id", "view_id")
  }

  // ----------------------------------------------------------- sessionize

  /** Batch: 30-min-gap session windows per user via lag + running sum.
    * Micro-precision epoch arithmetic (integer) so batch, stream, and
    * oracle agree exactly.
    */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    events.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("prev", lag("tus", 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull || col("tus") - col("prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("min_tus"), max(col("tus")).as("max_tus"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        expr("min_tus div 1000000").as("session_start_s"),
        expr("max_tus div 1000000").as("session_end_s"))
  }

  /** Keyed session state (public: Spark's codegen'd state serializer needs
    * accessible constructor/accessors).
    */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)

  /** Streaming form: per-user open-session state; events close a session
    * when the gap is exceeded, the event-time timeout flushes the final
    * one once the watermark passes lastTs + gap.
    */
  def sessionizeStream(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.withWatermark("ts", "0 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, it, state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.startUs / 1000000, s.lastUs / 1000000, s.n))
          } else {
            val sorted = it.toSeq.sortBy(e => (tsMicros(e.ts), e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val tus = tsMicros(e.ts)
              open match {
                case Some(s) if tus - s.lastUs <= gapUs =>
                  open = Some(s.copy(lastUs = tus, n = s.n + 1))
                case Some(s) =>
                  closed += SessionOut(uid, s.startUs / 1000000, s.lastUs / 1000000, s.n)
                  open = Some(OpenSession(tus, tus, 1))
                case None =>
                  open = Some(OpenSession(tus, tus, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.result().iterator
          }
      }
  }
}
