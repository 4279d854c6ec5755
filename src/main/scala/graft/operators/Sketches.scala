package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate sketches for profiling at scale: HyperLogLog++ distinct
  * counts, approximate quantiles, and heavy hitters — the estimators a
  * discovery pass runs when exact aggregation over 100 TB is not worth
  * the shuffle. All built on Spark's codegen'd sketch aggregates
  * (approx_count_distinct / percentile_approx); results are deterministic
  * for a fixed input (the sketches are data-order independent in their
  * merge), but not exactly equal to the exact answers — specs bound the
  * relative error instead of an external oracle.
  */
object Sketches {

  /** Per-group HLL++ distinct count and median estimate. */
  def groupProfile(df: DataFrame, groupCol: String, distinctCol: String,
                   valueCol: String, rsd: Double = 0.01): DataFrame =
    df.groupBy(groupCol).agg(
      approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
      percentile_approx(col(valueCol), lit(0.5), lit(10000)).as("approx_median"),
      count(lit(1)).as("n_rows"))

  /** Heavy hitters: values whose frequency reaches `support` of the total.
    * Fully lazy — the total is a broadcast one-row aggregate, not a driver
    * count(), so the operator composes into larger plans without an
    * action. Exact groupBy form; a one-pass CMS sketch would approximate
    * exactly this output.
    */
  def heavyHitters(df: DataFrame, valueCol: String, support: Double): DataFrame = {
    val totals = df.agg(count(lit(1)).as("__total"))
    df.groupBy(valueCol).agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(totals))
      .filter(col("freq") >= col("__total") * support)
      .drop("__total")
  }
}
