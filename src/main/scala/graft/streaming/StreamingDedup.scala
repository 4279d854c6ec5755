package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online near-dup detection: documents arrive as a stream and LSH band
  * buckets live as keyed state, so every new document is checked against
  * everything ingested before it — continuously, without re-scanning the
  * corpus.
  *
  * The signature computation is doc-LOCAL (a typed map, no shuffle):
  * [[org.apache.spark.sql.graft.MinHashJvm]] reproduces the relational
  * shingle→minhash→band arithmetic bit-for-bit (spec-verified), so the
  * emitted candidates equal the batch banded self-join's on the same
  * corpus. The only shuffle is the groupByKey on (band, bandKey) — the
  * same key the batch equi-join shuffles on.
  *
  * Emitted pairs are CANDIDATES (possibly >1 band per pair across
  * micro-batch boundaries; dedupe downstream); exact verification joins
  * the pair ids back to the stored corpus, exactly as the batch path
  * verifies — same split as the reference's discovery vs replication
  * phases. Hot buckets (stop-shingle collisions) are capped at
  * `maxBucket` ids: past the cap a bucket stops emitting, bounding both
  * state size and the quadratic pair blowup a degenerate bucket would
  * cause — the standard LSH frequency-cap, here as a streaming-state
  * guarantee.
  */
object StreamingDedup {

  final case class DocIn(doc_id: Long, text: String)
  final case class BandRow(band: Int, bh: Long, doc_id: Long)
  final case class CandidatePair(doc_a: Long, doc_b: Long)
  /** Public: the state codegen serializer requires a public class. */
  final case class BucketState(ids: Seq[Long])

  def lshCandidateStream(docs: Dataset[DocIn], n: Int, numPerm: Int,
                         bands: Int, maxBucket: Int = 64): Dataset[CandidatePair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs.flatMap { d =>
      val hashes = org.apache.spark.sql.graft.MinHashJvm.shingleHashes(d.text, n)
      // A doc too short to shingle has NO band rows — matching the batch
      // form, where the empty shingle group never reaches the aggregate.
      // (The identity-fold keys would otherwise bucket all short docs
      // together as false candidates.)
      if (hashes.isEmpty) Iterator.empty
      else {
        val keys = org.apache.spark.sql.graft.MinHashJvm.bandKeys(
          hashes, numPerm, bands)
        keys.iterator.zipWithIndex.map { case (bh, b) => BandRow(b, bh, d.doc_id) }
      }
    }
    banded.groupByKey(r => (r.band, r.bh))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state: GroupState[BucketState]) =>
          val seen = state.getOption.map(_.ids).getOrElse(Seq.empty)
          val seenSet = seen.toSet
          // deterministic emission order within a micro-batch
          val fresh = rows.map(_.doc_id).toSeq.distinct.sorted
            .filterNot(seenSet)
          val room = math.max(0, maxBucket - seen.length)
          val admitted = fresh.take(room)
          val out = Seq.newBuilder[CandidatePair]
          for ((nw, i) <- admitted.zipWithIndex) {
            for (old <- seen)
              out += CandidatePair(math.min(old, nw), math.max(old, nw))
            for (j <- 0 until i)
              out += CandidatePair(math.min(admitted(j), nw), math.max(admitted(j), nw))
          }
          if (admitted.nonEmpty) state.update(BucketState(seen ++ admitted))
          out.result().iterator
      }
  }
}
