package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Continuous dedup-index maintenance — the streaming face of
  * [[graft.operators.TextDedup.upsertLshPairs]]'s banded-key relation
  * and the text twin of [[StreamingIvfUpsert]]: a document change stream
  * (upserts carry the new text, deletes a tombstone, each stamped with a
  * writetime) maintains the per-document LSH band keys of the standing
  * index. A compacting sink explodes the winner rows to the (doc_id,
  * band, bh) relation — exactly the maintained `bandedKeys` side of the
  * materialized index; candidate generation stays a batch equi-join
  * against it (the `upsertLshPairs` shape), never a streaming join.
  *
  * Re-banding is STATELESS and runs before the fold: every change row
  * maps to its band-key array via [[org.apache.spark.sql.graft
  * .MinHashLocal]], whose arithmetic is bit-identical to the declarative
  * `bandedKeys(shingleHashTable(...))` pipeline — so state per id is the
  * winning (writetime, bands) at `bands` longs, never the document text.
  * A document with fewer than `n` tokens bands to an EMPTY array,
  * mirroring the batch pipeline where such documents contribute no
  * banded rows.
  *
  * The fold is a max over a TOTAL order on writes — (writetime asc,
  * tombstone-beats-value, then lexicographically greater band array) —
  * commutative, associative and idempotent, so ANY micro-batch split and
  * ANY at-least-once replay converge ([[StreamingLww]]'s tie direction,
  * [[StreamingIvfUpsert]]'s fold shape). Two same-writetime texts that
  * band identically make the tie-break moot: the emitted value IS the
  * band array. [[graft.streaming.StreamingLshUpsertSpec]] proves the
  * streamed overlay ≡ the `upsertLshPairs` maintained banded relation on
  * the folded change set, under shuffled splits, full replays and
  * equal-writetime ties.
  */
object StreamingLshUpsert {

  /** One change-feed row: `text == null` is a delete tombstone. */
  final case class DocChange(doc_id: Long, text: String, writetime: Long)

  /** The maintained banded-key row for a document, emitted whenever its
    * state changes; `deleted` rows are the tombstones a sink compacts
    * away (bands empty). A non-deleted row REPLACES all of the
    * document's previous (band, bh) rows with `posexplode(bands)`.
    */
  final case class BandedRow(doc_id: Long, bands: Array[Long],
                             writetime: Long, deleted: Boolean)

  /** Lexicographic long-array order, longer wins on prefix equality —
    * the equal-writetime value tie-break (the [[StreamingIvfUpsert
    * .vecGt]] shape over band keys).
    */
  private[streaming] def arrGt(a: Array[Long], b: Array[Long]): Boolean = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val c = java.lang.Long.compare(a(i), b(i))
      if (c != 0) return c > 0
      i += 1
    }
    a.length > b.length
  }

  def bandedStream(changes: Dataset[DocChange], n: Int, numPerm: Int,
                   bands: Int): Dataset[BandedRow] = {
    val spark = changes.sparkSession
    import spark.implicits._
    // stateless re-band: delta-sized, embarrassingly parallel, and the
    // only stage that touches document text
    val banded = changes.map { ch =>
      (ch.doc_id,
        if (ch.text == null) null
        else org.apache.spark.sql.graft.MinHashLocal
          .bandKeys(ch.text, n, numPerm, bands),
        ch.writetime)
    }
    banded.groupByKey(_._1)
      .mapGroupsWithState[(Long, Array[Long], Boolean), BandedRow](
        GroupStateTimeout.NoTimeout) { (id, it, state) =>
        // state = the winning (writetime, bands, tombstone?); the total
        // order below makes the fold commutative + idempotent
        var (w, bk, del) =
          state.getOption.getOrElse((Long.MinValue, null: Array[Long], true))
        it.foreach { case (_, chBands, chW) =>
          val wins = chW > w || (chW == w && {
            if (chBands == null) !del           // tombstone beats value
            else !del && bk != null && arrGt(chBands, bk) // greater bands
          })
          if (wins) {
            w = chW
            if (chBands == null) { del = true; bk = null }
            else { del = false; bk = chBands }
          }
        }
        state.update((w, bk, del))
        BandedRow(id, if (del) Array.emptyLongArray else bk, w, del)
      }
  }
}
