package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuous ANN-index maintenance — the streaming face of
  * [[graft.operators.Ann.ivfIndexUpsert]]: an embedding change stream
  * (upserts carry the new vector, deletes a tombstone, each stamped with
  * a writetime) folds into per-id state holding the id's current winning
  * write, and emits the FROZEN-centroid assignment of that winner.
  *
  * The fold is a max over a TOTAL order on writes — (writetime asc,
  * tombstone-beats-value, then lexicographically greater vector) — so it
  * is commutative, associative and idempotent: ANY micro-batch split and
  * ANY at-least-once replay converge to the same state. The vector
  * tie-break mirrors [[StreamingLww]]'s greater-value rule (tombstone
  * direction likewise matches); without it, two non-null upserts at the
  * same writetime would resolve by arrival order and different splits
  * could converge to different assignments.
  * [[graft.streaming.StreamingIvfUpsertSpec]] proves stream ≡
  * [[graft.operators.Ann.ivfIndexUpsert]] under shuffled splits and full
  * replays, including equal-writetime value/value and value/tombstone
  * ties.
  *
  * Assignment runs INSIDE the state update against the broadcast-small
  * frozen centroid set using [[graft.operators.Ann.cosineLocal]] — the
  * same IEEE evaluation order as the batch path's `FloatVecCosine`
  * expression, same (cos desc, centroid_id asc) tie-break — so the
  * streaming index and the batch index pick identical buckets. State per
  * id is the winning (writetime, vector) — bounded by the embedding
  * width; the engine checkpoints it. Centroid retraining (the
  * [[graft.operators.Ann.centroidDrift]] tripwire) restarts the query
  * with a new frozen set, exactly like the batch rebuild.
  */
object StreamingIvfUpsert {

  /** One change-feed row: `vec == null` is a delete tombstone. */
  final case class VecChange(vec_id: Long, vec: Array[Float], writetime: Long)

  /** The maintained index row for an id, emitted whenever its state
    * changes; `deleted` rows are the tombstones a sink compacts away
    * (centroid_id = −1).
    */
  final case class IndexRow(vec_id: Long, centroid_id: Long,
                            writetime: Long, deleted: Boolean)

  /** Nearest frozen centroid by (cosine desc, centroid_id asc) — the
    * [[graft.operators.Ann.ivfAssign]] pick order. `centroids` must be
    * sorted by id ascending (callers use [[indexStream]], which sorts).
    */
  private def assignLocal(v: Array[Float],
                          centroids: Seq[(Long, Array[Float])]): Long = {
    var bestId = -1L
    var bestCos = Double.NegativeInfinity
    for ((cid, cv) <- centroids) {
      val c = graft.operators.Ann.cosineLocal(v, cv)
      if (c > bestCos) { bestCos = c; bestId = cid }
    }
    bestId
  }

  /** Lexicographic vector order via Float.compare (a total order — NaN
    * and signed zeros rank deterministically), longer wins on prefix
    * equality. The equal-writetime value tie-break.
    */
  private[streaming] def vecGt(a: Array[Float], b: Array[Float]): Boolean = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = java.lang.Float.compare(a(i), b(i))
      if (c != 0) return c > 0
      i += 1
    }
    a.length > b.length
  }

  def indexStream(changes: Dataset[VecChange],
                  centroids: Seq[(Long, Array[Float])]): Dataset[IndexRow] = {
    require(centroids.nonEmpty, "need a frozen centroid set")
    val spark = changes.sparkSession
    import spark.implicits._
    val cents = centroids.sortBy(_._1)
    changes.groupByKey(_.vec_id)
      // CHECKPOINT COMPATIBILITY: the state type (Long, Array[Float],
      // Boolean) is part of the query's on-disk checkpoint contract —
      // Structured Streaming persists it via its Encoder, and a restart
      // from an existing checkpoint DESERIALIZES old state with the new
      // code's encoder. Reordering/retyping/widening this tuple (or
      // switching to a case class) changes the encoder schema and makes
      // old checkpoints unreadable; ship such a change as a new query
      // (fresh checkpoint dir) seeded from the batch index, exactly like
      // a centroid retrain. Adding information must go through a new
      // field ON A NEW QUERY, never an in-place reinterpretation.
      .mapGroupsWithState[(Long, Array[Float], Boolean), IndexRow](
        GroupStateTimeout.NoTimeout) { (id, it, state) =>
        // state = the winning (writetime, vector, tombstone?); the total
        // order below makes the fold commutative + idempotent
        var (w, vec, del) =
          state.getOption.getOrElse((Long.MinValue, null: Array[Float], true))
        it.foreach { ch =>
          val wins = ch.writetime > w || (ch.writetime == w && {
            if (ch.vec == null) !del            // tombstone beats value
            else !del && vec != null && vecGt(ch.vec, vec) // greater vector
          })
          if (wins) {
            w = ch.writetime
            if (ch.vec == null) { del = true; vec = null }
            else { del = false; vec = ch.vec }
          }
        }
        state.update((w, vec, del))
        IndexRow(id, if (del) -1L else assignLocal(vec, cents), w, del)
      }
  }
}
