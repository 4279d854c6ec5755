package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuous shingle-index maintenance — the streaming face of the
  * standing h-bucketed (doc_id, h) relation (`shingle_index_roundtrip`)
  * and the third streaming index twin next to [[StreamingIvfUpsert]]
  * (IVF) and [[StreamingLshUpsert]] (LSH bands): a document change
  * stream (upserts carry the new text, deletes a tombstone, each
  * stamped with a writetime) maintains the per-document distinct
  * shingle-hash set of the standing index. A compacting sink explodes
  * the winner rows to the (doc_id, h) relation — exactly the maintained
  * side `TextDedup.containmentPairsCappedFrom` reads; containment
  * reporting stays the batch plan over the maintained table, never a
  * streaming join.
  *
  * Re-shingling is STATELESS and runs before the fold: every change row
  * maps to its sorted distinct hash array via
  * [[org.apache.spark.sql.graft.MinHashLocal.shingleHashes]], whose
  * arithmetic is bit-identical to the declarative
  * `shingleHashTable(...)` pipeline — so state per id is the winning
  * (writetime, hashes), never the document text. The array is CANONICAL
  * (sorted ascending; the relation is a set), which both bounds the
  * state representation and makes the lexicographic tie-break
  * deterministic. A document with fewer than `n` tokens shingles to an
  * EMPTY array, mirroring the batch pipeline where such documents
  * contribute no index rows.
  *
  * The fold is a max over a TOTAL order on writes — (writetime asc,
  * tombstone-beats-value, then lexicographically greater hash array) —
  * commutative, associative and idempotent, so ANY micro-batch split
  * and ANY at-least-once replay converge ([[StreamingLww]]'s tie
  * direction, [[StreamingIvfUpsert]]'s fold shape).
  * [[graft.streaming.StreamingShingleUpsertSpec]] proves the streamed
  * overlay ≡ `TextDedup.shingleHashTable` of the folded corpus, under
  * shuffled splits, full replays and equal-writetime ties.
  *
  * CHECKPOINT COMPATIBILITY: the state type (Long, Array[Long],
  * Boolean) is part of the query's on-disk checkpoint contract (see the
  * [[StreamingIvfUpsert.indexStream]] note) — ship a state-shape change
  * as a new query seeded from the batch index, never in place.
  */
object StreamingShingleUpsert {

  /** One change-feed row: `text == null` is a delete tombstone. */
  final case class DocChange(doc_id: Long, text: String, writetime: Long)

  /** The maintained shingle-set row for a document, emitted whenever
    * its state changes; `deleted` rows are the tombstones a sink
    * compacts away (hashes empty). A non-deleted row REPLACES all of
    * the document's previous (doc_id, h) rows with `explode(hashes)`.
    */
  final case class ShingleRow(doc_id: Long, hashes: Array[Long],
                              writetime: Long, deleted: Boolean)

  def shingleStream(changes: Dataset[DocChange], n: Int): Dataset[ShingleRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    // stateless re-shingle: delta-sized, embarrassingly parallel, and
    // the only stage that touches document text
    val hashed = changes.map { ch =>
      (ch.doc_id,
        if (ch.text == null) null
        else org.apache.spark.sql.graft.MinHashLocal.shingleHashes(ch.text, n),
        ch.writetime)
    }
    hashed.groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Long], Boolean), ShingleRow](
        GroupStateTimeout.NoTimeout) { (id, it, state) =>
        // state = the winning (writetime, hashes, tombstone?); the total
        // order below makes the fold commutative + idempotent
        var (w, hs, del) =
          state.getOption.getOrElse((Long.MinValue, null: Array[Long], true))
        it.foreach { case (_, chHashes, chW) =>
          val wins = chW > w || (chW == w && {
            if (chHashes == null) !del          // tombstone beats value
            else !del && hs != null &&
              StreamingLshUpsert.arrGt(chHashes, hs) // greater hash array
          })
          if (wins) {
            w = chW
            if (chHashes == null) { del = true; hs = null }
            else { del = false; hs = chHashes }
          }
        }
        state.update((w, hs, del))
        ShingleRow(id, if (del) Array.emptyLongArray else hs, w, del)
      }
  }
}
