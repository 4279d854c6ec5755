package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Profiling/observability aggregates from the reference: the column-stats
  * sampler (glue/sbin/keyspaces/CQLReplicator.scala:1683-1756) and the
  * per-tile replication stats (:1161-1215).
  *
  * The reference emits stats as wide one-row JSON; we emit long format
  * (one row per column) — same information, joinable, and a single
  * wide-aggregate pass over the data either way.
  */
object Stats {

  /** Per-column min/avg/max in one aggregation pass. Numeric columns
    * profile the value, string columns the length (reference :1724-1737).
    * avg is computed as an exact decimal sum divided as double, so the
    * result is independent of partitioning/merge order.
    */
  def columnStats(df: DataFrame): DataFrame = {
    val (profiled, wide) = profiledWide(df)
    val stacked = profiled.map { case (name, _) =>
      struct(lit(name).as("col_name"),
        col(s"${name}__min").as("min_v"),
        col(s"${name}__avg").as("avg_v"),
        col(s"${name}__max").as("max_v"))
    }
    wide.select(explode(array(stacked: _*)).as("s")).select("s.*")
  }

  /** Row-width estimate: sums of the per-column min/avg/max over all
    * profiled columns (reference addTotalColumns, :1690-1717). Additions
    * run in schema order so the doubles are engine-reproducible.
    */
  def columnStatsTotals(df: DataFrame): DataFrame = {
    val (profiled, wide) = profiledWide(df)
    def total(suffix: String) = profiled
      .map { case (name, _) =>
        coalesce(col(s"${name}__$suffix").cast("double"), lit(0.0))
      }.reduce(_ + _)
    wide.select(
      total("min").as("row_min_total"),
      total("avg").as("row_avg_total"),
      total("max").as("row_max_total"))
  }

  private def profiledWide(df: DataFrame): (Seq[(String, Column)], DataFrame) = {
    val profiled = df.schema.fields.toSeq.flatMap { f =>
      val base: Option[Column] = f.dataType match {
        case _: NumericType => Some(col(f.name).cast("double"))
        case StringType     => Some(length(col(f.name)).cast("double"))
        case BinaryType     => Some(length(col(f.name)).cast("double"))
        case _              => None // timestamps etc: fixed width, not profiled
      }
      base.map(f.name -> _)
    }
    val aggs = profiled.flatMap { case (name, c) =>
      Seq(
        min(c).as(s"${name}__min"),
        (sum(c.cast(DecimalType(38, 6))).cast("double") / count(c)).as(s"${name}__avg"),
        max(c).as(s"${name}__max"))
    }
    (profiled, df.agg(aggs.head, aggs.tail: _*))
  }

  /** Fixed-bin histogram of a numeric column per group — the value-
    * distribution half of data profiling beside [[columnStats]]. Bounds
    * come from one global min/max aggregate (a one-row relation that
    * broadcasts — no driver action, no second full pass materialized to
    * the driver); bucket = floor((v-lo)/width) capped into [0, bins-1].
    * All row-wise IEEE arithmetic on engine-identical inputs, so bucket
    * assignment reproduces exactly cross-engine. Degenerate lo==hi maps
    * everything to bucket 0. Heavy-in/tiny-out: one scan + one
    * partial-aggregated groupBy.
    */
  def valueHistogram(df: DataFrame, valueCol: String, groupCol: String,
                     bins: Int): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val v = col(valueCol).cast("double")
    val bounds = df.agg(min(v).as("lo"), max(v).as("hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(
            floor((v - col("lo")) / ((col("hi") - col("lo")) / lit(bins.toDouble))),
            lit((bins - 1).toLong)).cast("long")))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-group z-score outlier detection over a numeric column: group
    * mean/variance derive from exact decimal sums of v and v² (order-
    * independent — v has two decimals, so the v² cast to DECIMAL(38,6)
    * never sits on a rounding boundary), sigma is the correctly-rounded
    * IEEE sqrt, and rows with |v-mean| > z·sigma flag with their score.
    * The per-group stats relation is groups-sized → broadcast back; one
    * scan, one tiny aggregate, no window over the big side.
    */
  def zscoreOutliers(df: DataFrame, valueCol: String, groupCol: String,
                     z: Double): DataFrame = {
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(v.cast(DecimalType(18, 2))).as("s1"),
        sum((v * v).cast(DecimalType(38, 6))).as("s2"))
      .select(col(groupCol),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        sqrt(greatest(
          col("s2").cast("double") / col("n").cast("double") -
            (col("s1").cast("double") / col("n").cast("double")) *
            (col("s1").cast("double") / col("n").cast("double")),
          lit(0.0))).as("sigma"))
    df.join(broadcast(stats), Seq(groupCol))
      .filter(abs(v - col("mean")) > lit(z) * col("sigma"))
      .withColumn("zscore",
        (v - col("mean")) / col("sigma"))
  }

  /** Replication cycle stats: per-tile inserted/updated/deleted key counts
    * (the reference accumulates these incrementally per tile via S3 JSON
    * merge, :1177-1192; one groupBy computes the whole cycle at once).
    * Inputs are the change-set DataFrames with a `tile` column.
    */
  def replicationStats(inserts: DataFrame, updates: DataFrame,
                       deletes: DataFrame): DataFrame = {
    def count1(df: DataFrame, op: String): DataFrame =
      df.select(col("tile"), lit(op).as("op"))
    count1(inserts, "insert")
      .unionByName(count1(updates, "update"))
      .unionByName(count1(deletes, "delete"))
      .groupBy("tile", "op").agg(count(lit(1)).as("n"))
  }
}
