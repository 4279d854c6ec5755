package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left row picks the most recent right row at or
  * before its event time, per key, within a tolerance.
  *
  * Spark has no native as-of join; the classic scalable re-expression is a
  * union + one window pass — tag both sides, sort by (key, time, side),
  * carry the latest right payload forward with last(ignoreNulls) — so the
  * whole join costs ONE shuffle on the key (the window), never a pairwise
  * join. DuckDB's native ASOF JOIN serves as the cross-paradigm oracle.
  */
object AsOf {

  /** Left rows (id, key, ts) matched to the latest right row (id, key, ts)
    * with rightTs <= leftTs and leftTs - rightTs <= toleranceUs. Output:
    * left columns + matched right id + gap; unmatched left rows keep
    * nulls. Right rows with equal (key, ts) are deduped to the max id so
    * the result is total-order deterministic.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   idCol: String, tsCol: String,
                   toleranceUs: Long): DataFrame = {
    // side 0 = right, side 1 = left: on an exact ts tie the right row
    // sorts FIRST, so a left row can match a right row at the same ts.
    val r = right
      .withColumn("rn", row_number().over(
        Window.partitionBy(keyCol, tsCol).orderBy(col(idCol).desc)))
      .filter(col("rn") === 1).drop("rn")
      .select(col(keyCol), col(tsCol), lit(0).as("side"),
        lit(null).cast("long").as("left_id"),
        col(idCol).as("right_id"), col(tsCol).as("right_ts"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("side"),
      col(idCol).as("left_id"),
      lit(null).cast("long").as("right_id"),
      lit(null).cast("long").as("right_ts"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("side"), col("left_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m_id", last(col("right_id"), ignoreNulls = true).over(w))
      .withColumn("m_ts", last(col("right_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("left_id"),
        col(keyCol),
        col(tsCol),
        when(col("m_ts").isNotNull && col(tsCol) - col("m_ts") <= toleranceUs,
          col("m_id")).as("matched_id"),
        when(col("m_ts").isNotNull && col(tsCol) - col("m_ts") <= toleranceUs,
          col(tsCol) - col("m_ts")).as("gap_us"))
  }

  /** Forward as-of join: each left row picks the EARLIEST right row at or
    * after its event time, per key, within the tolerance — the mirror of
    * [[asofBackward]] (same one-shuffle union + window plan, descending
    * time order).
    */
  def asofForward(left: DataFrame, right: DataFrame, keyCol: String,
                  idCol: String, tsCol: String,
                  toleranceUs: Long): DataFrame = {
    val r = right
      .withColumn("rn", row_number().over(
        Window.partitionBy(keyCol, tsCol).orderBy(col(idCol).desc)))
      .filter(col("rn") === 1).drop("rn")
      .select(col(keyCol), col(tsCol), lit(0).as("side"),
        lit(null).cast("long").as("left_id"),
        col(idCol).as("right_id"), col(tsCol).as("right_ts"))
    val l = left.select(col(keyCol), col(tsCol), lit(1).as("side"),
      col(idCol).as("left_id"),
      lit(null).cast("long").as("right_id"),
      lit(null).cast("long").as("right_ts"))
    // Descending time: carrying the latest right payload forward over the
    // desc order yields each left row's nearest right at-or-AFTER it; on
    // an exact tie the right row (side 0) still sorts first so it matches.
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).desc, col("side"), col("left_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("m_id", last(col("right_id"), ignoreNulls = true).over(w))
      .withColumn("m_ts", last(col("right_ts"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(
        col("left_id"),
        col(keyCol),
        col(tsCol),
        when(col("m_ts").isNotNull && col("m_ts") - col(tsCol) <= toleranceUs,
          col("m_id")).as("matched_id"),
        when(col("m_ts").isNotNull && col("m_ts") - col(tsCol) <= toleranceUs,
          col("m_ts") - col(tsCol)).as("gap_us"))
  }
}
