package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Ingest-time corpus curation: the batch pipeline's first two stages —
  * quality gate, then exact dedup — applied AS DOCUMENTS ARRIVE, so a
  * continuously-ingested corpus stays curated without re-scanning (the
  * streaming complement of [[graft.operators.CurationPipeline]]; the
  * near-dup stage streams separately via [[StreamingDedup]]).
  *
  * The quality gate is the same codegen'd [[TextAnalysis.qualityScore]]
  * column the batch path uses — stateless, evaluated in the stream's
  * select. Exact dedup keys the stream by the relational `md5(text)` (bit
  * -identical to the batch hash) and keeps ONE row per hash in keyed
  * state: the first arrival wins — the online contract, where "first" is
  * arrival order rather than the batch form's global min-id (equal when
  * ingest order follows ids; within one micro-batch ties break to min id
  * so replays stay deterministic). State per distinct payload is one
  * long — the ledger's "have I ingested this content" as checkpointed
  * stream state.
  */
object StreamingCuration {

  final case class CuratedDoc(doc_id: Long, text_hash: String, text: String)
  /** Public: the state codegen serializer requires a public class. */
  final case class SeenState(first_id: Long)

  def firstSeenStream(docs: DataFrame, idCol: String, textCol: String,
                      minQuality: Double): Dataset[CuratedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gated = docs
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .select(col(idCol).cast("long").as("doc_id"),
        md5(col(textCol)).as("text_hash"),
        col(textCol).as("text"))
      .as[CuratedDoc]
    gated.groupByKey(_.text_hash)
      .flatMapGroupsWithState[SeenState, CuratedDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it, state: GroupState[SeenState]) =>
          if (state.exists) Iterator.empty // content already ingested
          else {
            val first = it.minBy(_.doc_id) // deterministic within a batch
            state.update(SeenState(first.doc_id))
            Iterator.single(first)
          }
      }
  }
}
