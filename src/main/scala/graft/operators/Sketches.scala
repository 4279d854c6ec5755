package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-key count-min estimate against a (broadcast) flattened sketch
    * column: min over the depth rows of the key's cell. Pure codegen'd
    * Column — `element_at(sketch, i·width + pmod(xxhash64(key, i), width)
    * + 1)` — bucket arithmetic bit-identical to [[org.apache.spark.sql
    * .graft.CountMinAgg]]'s update (both are Spark's own xxhash64).
    */
  def cmsEstimate(sketch: Column, key: Column, depth: Int, width: Int): Column =
    least((0 until depth).map { i =>
      element_at(sketch,
        (lit(i.toLong * width) + pmod(xxhash64(key, lit(i)), lit(width.toLong))
          + 1L).cast("int"))
    }: _*)

  /** [[heavyHitters]] at its 100 TB configuration: a one-pass count-min
    * sketch (fixed depth×width state, mergeable — the only full-data
    * aggregate has NO grouping key, so nothing shuffles by key) broadcasts
    * back as a row-wise candidate filter; only rows of candidate keys
    * reach the exact groupBy. CMS never underestimates, so the candidate
    * set is a superset of the true heavy keys and the final exact filter
    * makes the output IDENTICAL to the exact form — the sketch buys the
    * shuffle reduction, not an approximation. Both filters compare
    * against the same `support · total` value, preserving the guarantee
    * under fp rounding.
    *
    * Keys of ANY type sketch through `xxhash64(value)` (a long on both the
    * update and estimate sides, so string/decimal/struct keys work — a
    * bare `cast('long')` would null out non-integral keys and silently
    * drop them from the sketch). A hash collision only MERGES two keys'
    * cells, i.e. overestimates — which CMS already does by construction —
    * and the exact post-filter still prunes it, so the output stays
    * identical to [[heavyHitters]] for every input type.
    */
  def heavyHittersCms(df: DataFrame, valueCol: String, support: Double,
                      depth: Int = 4, width: Int = 8192): DataFrame = {
    val sk = df.agg(
      org.apache.spark.sql.graft.CountMinAggFunctions
        .countMinSketch(xxhash64(col(valueCol)), depth, width).as("__sk"),
      count(lit(1)).as("__total"))
    df.crossJoin(broadcast(sk))
      .filter(cmsEstimate(col("__sk"), xxhash64(col(valueCol)),
        depth, width) >= col("__total") * support)
      .groupBy(col(valueCol), col("__total"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= col("__total") * support)
      .drop("__total")
  }
}
