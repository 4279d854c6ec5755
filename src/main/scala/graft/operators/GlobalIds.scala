package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row numbering over a sorted key — the "assign every
  * document a stable dataset-wide id" step of corpus assembly.
  *
  * Spark's built-ins both fail this at scale: `row_number() OVER (ORDER
  * BY k)` collapses the whole table into ONE window partition, and
  * `monotonically_increasing_id` is neither contiguous nor
  * order-preserving. The scalable shape is the classic two-pass rank:
  *
  *   1. bucket rows by an ORDER-PRESERVING function of the key
  *      (uniform-width ranges over [min, max] — two scalars to the
  *      driver from a column-pruned agg);
  *   2. histogram the buckets (≤ `nBuckets` rows to the driver — bucket
  *      COUNTS, never row data) and prefix-sum them into offsets;
  *   3. `row_number()` within each bucket (a PARTITIONED window — every
  *      bucket sorts independently, in parallel) plus the broadcast
  *      bucket offset.
  *
  * The result is bit-identical to the single-partition window at any
  * parallelism. Per-bucket work is bounded by the widest bucket; for
  * value-skewed keys raise `nBuckets` or pre-map the key through a
  * quantile bucketing — the offsets machinery is unchanged.
  *
  * Keys must be unique and non-null (dataset ids are); ties would make
  * the ordering, and therefore the ids, nondeterministic.
  */
object GlobalIds {

  /** Adds `idName` = 1-based rank of `keyCol` (a numeric column) in
    * global ascending order. Two tiny driver actions (min/max, bucket
    * histogram), one shuffle (the bucket-partitioned window).
    */
  def assign(df: DataFrame, keyCol: String, nBuckets: Int = 256,
             idName: String = "global_id"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be > 0")
    val bounds = df.agg(min(col(keyCol).cast("long")),
      max(col(keyCol).cast("long"))).head()
    if (bounds.isNullAt(0)) return df.withColumn(idName, lit(null).cast("long"))
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (mx - mn) / nBuckets + 1)
    val bucketed = df.withColumn("_gid_b",
      ((col(keyCol).cast("long") - lit(mn)) / lit(width)).cast("long"))
    val hist = bucketed.groupBy("_gid_b").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = hist.scanLeft((-1L, 0L)) { case ((_, acc), (b, c)) =>
      (b, acc + c)
    }.tail.zip(hist).map { case ((b, end), (_, c)) => Row(b, end - c) }
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq, 1),
      new org.apache.spark.sql.types.StructType()
        .add("_gid_b", "long").add("_gid_off", "long"))
    bucketed.join(broadcast(offDf), "_gid_b")
      .withColumn(idName,
        row_number().over(Window.partitionBy("_gid_b").orderBy(col(keyCol)))
          .cast("long") + col("_gid_off"))
      .drop("_gid_b", "_gid_off")
  }
}
