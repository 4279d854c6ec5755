package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

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

  /** Exact materialized byte size of already-cached/checkpointed RDDs, from
    * the block manager's storage report (driver-side metadata, no job).
    * `ids` are the RDD ids a `localCheckpoint(true)` registered — e.g. the
    * tracked set Clustering's checkpointTracked returns. Returns 0 when
    * nothing is found (empty relation or already unpersisted).
    */
  def materializedBytes(sc: SparkContext, ids: Set[Int]): Long =
    sc.getRDDStorageInfo.filter(i => ids.contains(i.id))
      .map(i => i.memSize + i.diskSize).sum

  /** Would a relation of `bytes` qualify for a broadcast join under the
    * session's own `spark.sql.autoBroadcastJoinThreshold`? Used to hint
    * `broadcast()` on relations whose TRUE size the caller has measured
    * (guide §3.1: the planner's estimate for a checkpointed relation is
    * "unknown", which plans sort-merge; the measured size makes the same
    * decision the optimizer would make if it could see the bytes). `-1`
    * (broadcast disabled) disables the hint too, so operators honor the
    * session's configuration at any scale.
    */
  def fitsBroadcast(spark: SparkSession, bytes: Long): Boolean = {
    val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val threshold =
      try raw.toLong
      catch {
        case _: NumberFormatException =>
          try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
          catch { case _: Exception => -1L }
      }
    threshold > 0 && bytes <= threshold
  }
}
