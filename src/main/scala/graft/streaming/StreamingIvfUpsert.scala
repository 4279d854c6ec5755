package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuous ANN-index maintenance — the streaming face of
  * [[graft.operators.Ann.ivfIndexUpsert]]: an embedding change stream
  * (upserts carry the new vector, deletes a tombstone, each stamped with
  * a writetime) folds into per-id state holding the FROZEN-centroid
  * assignment of the id's current winner.
  *
  * The fold is last-writer-wins on the writetime (ties to the tombstone
  * — the same deterministic direction as [[StreamingLww]]'s value
  * tie-break), which is commutative, associative and idempotent, so ANY
  * micro-batch split and ANY at-least-once replay converge to the batch
  * upsert's state — the spec proves stream ≡ [[graft.operators.Ann
  * .ivfIndexUpsert]] under shuffled splits and replays.
  *
  * Assignment runs INSIDE the state update against the broadcast-small
  * frozen centroid set using [[graft.operators.Ann.cosineLocal]] — the
  * same IEEE evaluation order as the batch path's `FloatVecCosine`
  * expression, same (cos desc, centroid_id asc) tie-break — so the
  * streaming index and the batch index pick identical buckets. State per
  * id is three scalars; the engine checkpoints it. Centroid retraining
  * (the [[graft.operators.Ann.centroidDrift]] tripwire) restarts the
  * query with a new frozen set, exactly like the batch rebuild.
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

  def indexStream(changes: Dataset[VecChange],
                  centroids: Seq[(Long, Array[Float])]): Dataset[IndexRow] = {
    require(centroids.nonEmpty, "need a frozen centroid set")
    val spark = changes.sparkSession
    import spark.implicits._
    val cents = centroids.sortBy(_._1)
    changes.groupByKey(_.vec_id)
      .mapGroupsWithState[(Long, Long, Boolean), IndexRow](
        GroupStateTimeout.NoTimeout) { (id, it, state) =>
        var (w, cid, del) =
          state.getOption.getOrElse((Long.MinValue, -1L, true))
        it.foreach { ch =>
          // newer writetime wins; at equal writetime the tombstone wins
          // (deterministic under any order); an identical replay is a
          // no-op either way
          val wins = ch.writetime > w ||
            (ch.writetime == w && ch.vec == null && !del)
          if (wins) {
            w = ch.writetime
            if (ch.vec == null) { del = true; cid = -1L }
            else { del = false; cid = assignLocal(ch.vec, cents) }
          }
        }
        state.update((w, cid, del))
        IndexRow(id, cid, w, del)
      }
  }
}
