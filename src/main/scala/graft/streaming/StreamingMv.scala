package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous materialized-view maintenance — the streaming form of
  * [[graft.operators.Cdc.mvMaintain]]. The batch operator derives view
  * mutations by joining two snapshots; here the CHANGE FEED already
  * carries each row's old and new images (the shape a CDC source such as
  * the reference's Iceberg change scan emits), so the derivation is a
  * pure per-row case analysis: STATELESS — no join, no watermark, no
  * state store — which is what makes it safe at any stream rate. The
  * same function applied to a batch frame of the joined snapshots equals
  * the batch operator row-for-row (spec-proven).
  *
  * Image-absence contract: a null old/new TIMESTAMP means the row did not
  * exist on that side (real writetimes are never null in the feed).
  */
object StreamingMv {

  /** Derives the view mutation stream from a change feed of
    * `pk + old_vk/old_ts + new_vk/new_ts` image pairs. Emits
    * `view_op ∈ {insert, delete, update}` with the view key and the
    * mutation's writetime; a view-key MOVE expands to delete(old key) +
    * insert(new key) via a ≤2-element explode in one projection.
    */
  def viewMutations(changes: DataFrame, pkCol: String,
                    oldVk: String = "old_vk", oldTs: String = "old_ts",
                    newVk: String = "new_vk", newTs: String = "new_ts"): DataFrame = {
    val pVk = col(oldVk)
    val pTs = col(oldTs)
    val cVk = col(newVk)
    val cTs = col(newTs)
    val tsChanged = !(pTs <=> cTs)
    val vkChanged = !(pVk <=> cVk)
    val mut = (op: String, vk: org.apache.spark.sql.Column,
               ts: org.apache.spark.sql.Column) =>
      struct(lit(op).as("view_op"), vk.as("vk"), ts.as("mts"))
    // A key move emits delete+insert regardless of whether ts moved —
    // mirroring Cdc.mvMaintain: a move with an unchanged writetime would
    // otherwise leave a ghost row under the old view key.
    val muts =
      when(pTs.isNull && cTs.isNotNull, array(mut("insert", cVk, cTs)))
        .when(cTs.isNull && pTs.isNotNull, array(mut("delete", pVk, pTs)))
        .when(pTs.isNotNull && cTs.isNotNull && vkChanged,
          array(mut("delete", pVk, pTs), mut("insert", cVk, cTs)))
        .when(pTs.isNotNull && cTs.isNotNull && tsChanged,
          array(mut("update", cVk, cTs)))
        .otherwise(array().cast("array<struct<view_op:string,vk:long,mts:long>>"))
    changes
      .select(col(pkCol), explode(muts).as("m"))
      .select(
        col("m.view_op").as("view_op"),
        col("m.vk").as("view_key"),
        col(pkCol),
        col("m.mts").cast("long").as("ts"))
  }
}
