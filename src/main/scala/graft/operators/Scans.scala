package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scan-parallelism plumbing shared by operators and query bodies (r14
  * optimization round).
  */
object Scans {

  /** Scale-ADAPTIVE compute spread: repartition `df` by `key` only when
    * its scan offers fewer partitions than the session's parallelism.
    *
    * Why it exists: the sf test tables are single-row-group parquet files
    * — ONE scan task, indivisible by any split-size config
    * (`maxPartitionBytes` / `minPartitionNum` cannot split inside a row
    * group) — so every per-row-expensive stage before the first exchange
    * ran on one core. A real 100 TB layout scans wide, and there the
    * extra exchange would be pure overhead: this helper skips it. The
    * parallelism probe builds the physical plan only — no Spark job runs.
    *
    * NOT for bucketed standing tables: their (deliberately) modest
    * partition counts carry co-location that a repartition would destroy
    * — callers pass raw scans only.
    */
  def spreadIfNarrow(df: DataFrame, key: Column): DataFrame =
    if (df.rdd.getNumPartitions <
        df.sparkSession.sparkContext.defaultParallelism)
      spreadByKey(df, key)
    else df

  /** Hash-repartition for COMPUTE spreading, pinned at the session's
    * configured shuffle parallelism. The explicit count matters: a bare
    * `repartition(key)` carries the REPARTITION_BY_COL shuffle origin,
    * which AQE's byte-based partition coalescing is allowed to fold —
    * and a few hundred KB of documents routinely coalesce to ONE
    * partition even though the work downstream of the exchange
    * (interpreted lambdas, codecs, window shingling, per-token hashing)
    * is CPU-dense per byte. Byte statistics cannot see CPU density;
    * pinning the count (REPARTITION_BY_NUM origin, never coalesced)
    * keeps the spread at the parallelism the session was GIVEN —
    * `spark.sql.shuffle.partitions`, which the bench/driver set to the
    * core count and a cluster deployment sizes for its executors — so
    * nothing here is tuned to any fixed machine shape.
    */
  def spreadByKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt, key)
}
