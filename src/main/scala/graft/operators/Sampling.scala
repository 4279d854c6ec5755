package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Random sampling
  * (`df.sample`) is not reproducible across runs/partitionings, which
  * breaks both the oracle discipline and dataset lineage at 100 TB —
  * every operator here derives its selection from a content hash, so the
  * same row set is chosen on any cluster at any parallelism.
  */
object Sampling {

  /** Portable UNIFORM 16-bit bucket in [0, 65536): the first 4 hex chars
    * of the key's md5 parsed as an integer — any engine with md5 and a
    * hex-string cast reproduces it (DuckDB: `('0x' || substr(md5(k), 1,
    * 4))::INTEGER`). Uniformity matters for threshold filters; a
    * byte-ascii construction (as in [[Cdc.tileMd5]], which only needs
    * modulo-uniformity) is NOT uniform over [0, 65536).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Keep rows whose key hashes below `rate` (0..1): a deterministic
    * Bernoulli sample. Pure filter — pushes down, no shuffle.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit((rate * 65536).toInt))

  /** Exactly `perStratum` rows per stratum, chosen by hash order (ties by
    * key) — deterministic stratified sampling. One shuffle on the stratum
    * column; at scale the window's per-stratum sort is bounded by stratum
    * size, and heavily skewed strata should pre-filter with [[hashSample]]
    * first.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       perStratum: Int): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(hashBucket(col(keyCol)), col(keyCol))))
      .filter(col("_rn") <= perStratum)
      .drop("_rn")
}
