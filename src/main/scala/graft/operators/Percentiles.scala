package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Exact interpolated percentiles WITHOUT per-group value buffering.
  *
  * Spark's `percentile` is an imperative aggregate that materializes a
  * value→count map of the whole group in ONE aggregation buffer. For
  * profiling queries the group is corpus-sized (all events of a type, all
  * users, all keys), so at 100 TB a single task buffers billions of
  * values and OOMs — the one aggregate shape that cannot be map-side
  * combined away. This operator computes the SAME bit-exact result
  * (`percentile` ≡ DuckDB `quantile_cont`, linear interpolation between
  * the two neighboring order statistics) from bounded-memory passes —
  * the [[GlobalIds]] discipline: bucket COUNTS travel to the driver,
  * row data never does.
  *
  *   1. per-group count/min/max — a map-side-combined groupBy whose
  *      groups-sized output is collected (the same broadcast-small
  *      contract every profiling operator here carries);
  *   2. per-(group, bucket) count/min/max over uniform value ranges —
  *      map-side combined, ≤ groups×buckets COUNT rows collected; the
  *      driver prefix-sums them and locates, for each needed order
  *      statistic `k`, its bucket and offset within the bucket;
  *   3. a bucket whose min == max answers directly (every rank in it
  *      has that value — this absorbs the all-values-equal skew case
  *      where one bucket holds the whole group); only mixed-value
  *      target buckets re-scan, ranked by a row_number window
  *      PARTITIONED BY (group, bucket) — a ~1/buckets slice of the
  *      group, sort-based and spillable, never an in-memory map.
  *
  * Interpolation replicates Spark's Percentile.getPercentile arithmetic
  * exactly: pos = p·(n−1); result = v_lo when ⌊pos⌋ = ⌈pos⌉ else
  * (⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi — so swapping this in under an
  * existing `percentile`/`quantile_cont` oracle changes nothing.
  *
  * EAGER: the three passes run at call time and the groups-sized result
  * returns as a local relation (it broadcast-joins downstream exactly
  * like the aggregate it replaces). Contracts: null values are ignored
  * (as `percentile` does); rows with a null group key are dropped up
  * front (the equi-join of the bucketing pass cannot see them — this
  * matches the operator's long-standing effective output); a group with
  * no non-null values is absent from the output (Spark emits a null
  * row). The broadcast-small contract on the GROUP COUNT is enforced:
  * pass 1 fails fast past `maxGroups` rather than letting a
  * per-user-sized key silently OOM the driver.
  *
  * Cost: three column-pruned scans instead of one, each a single
  * map-side-combined shuffle. At 100 TB that trade — two extra pruned
  * scans for no unbounded buffer — is a report instead of an OOM.
  */
object Percentiles {

  /** Returns one row per group: the group columns plus one double column
    * per requested percentile.
    *
    * @param ps      (fraction in [0,1], output column name) pairs
    * @param groupCols empty ⇒ one global row (null-filled on empty input)
    * @param buckets histogram resolution per group; capped so the
    *                driver-held histogram stays ≤ ~4M count rows
    * @param maxGroups hard ceiling on distinct groups (pass 1 fails fast
    *                beyond it); keeps the driver-collect contract a
    *                checked invariant instead of prose
    */
  def exactPercentiles(df: DataFrame, value: Column, groupCols: Seq[String],
                       ps: Seq[(Double, String)],
                       buckets: Int = 1024,
                       maxGroups: Int = 1000000): DataFrame = {
    require(ps.nonEmpty, "need at least one percentile")
    require(ps.forall { case (p, _) => p >= 0.0 && p <= 1.0 },
      "percentiles must lie in [0, 1]")
    require(buckets >= 2, "need at least 2 buckets")
    val spark = df.sparkSession

    // Global percentiles run as a single constant group (dropped below).
    val dummy = groupCols.isEmpty
    val gNames = if (dummy) Seq("__g") else groupCols
    val gcols = gNames.map(col)
    val base = if (dummy) df.withColumn("__g", lit(0)) else df
    // Null group keys never survived the pass-2 equi-join; drop them
    // before pass 1 so `targets` and `hist` agree on the group set.
    val nonNullKeys =
      if (dummy) lit(true)
      else gNames.map(col(_).isNotNull).reduce(_ && _)
    val data = base
      .select(gcols :+ value.cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull && nonNullKeys)
    val gFields = gNames.map(n => data.schema(n))

    def outDf(rows: Seq[Row]): DataFrame = {
      val schema = StructType(gFields ++
        ps.map { case (_, n) => StructField(n, DoubleType) })
      val local = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema)
      if (dummy) local.drop("__g") else local
    }

    // Pass 1: per-group count and value range (groups-sized collect).
    // The limit caps the collect itself, so an over-cardinality key
    // fails fast instead of OOM-ing the driver first.
    val gstatsRows = data.groupBy(gcols: _*)
      .agg(count(lit(1)).as("__n"), min("__v").as("__mn"), max("__v").as("__mx"))
      .limit(maxGroups + 1)
      .collect()
    require(gstatsRows.length <= maxGroups,
      s"exactPercentiles: more than $maxGroups distinct groups for key " +
        s"${gNames.mkString("(", ",", ")")} — the driver-held histogram " +
        "contract does not hold; aggregate per-group percentiles " +
        "distributedly (e.g. percentile_approx) or raise maxGroups")
    if (gstatsRows.isEmpty) {
      // A global aggregate still emits one null-filled row on empty
      // input, as agg(percentile(...)) would; grouped output is empty.
      return outDf(if (dummy) Seq(Row.fromSeq(0 +: ps.map(_ => null))) else Nil)
    }
    val k = gNames.size
    val gstats = gstatsRows.map { r =>
      (r.toSeq.take(k), (r.getLong(k), r.getDouble(k + 1), r.getDouble(k + 2)))
    }.toMap

    // Keep the driver-held histogram bounded regardless of group count.
    val nBuckets = math.max(2,
      math.min(buckets.toLong, 4000000L / gstatsRows.length).toInt)

    // Per (group, percentile): interpolation position and needed ranks.
    val targets = gstats.map { case (g, (n, _, _)) =>
      g -> ps.map { case (p, _) =>
        val pos = p * (n - 1)
        (pos, pos.floor.toLong + 1, pos.ceil.toLong + 1)
      }
    }

    // Shared bucketed view for passes 2 and 3. Bounds ride a broadcast
    // local relation — one scan each, no driver round trip in the plan.
    val gstatsDf = spark.createDataFrame(
      java.util.Arrays.asList(gstatsRows.map(r =>
        Row.fromSeq(r.toSeq.take(k) ++ Seq(r.getDouble(k + 1), r.getDouble(k + 2)))): _*),
      StructType(gFields ++ Seq(StructField("__mn", DoubleType),
        StructField("__mx", DoubleType))))
    val width = (col("__mx") - col("__mn")) / lit(nBuckets.toDouble)
    val bucketed = data.join(broadcast(gstatsDf), gNames)
      .withColumn("__b",
        when(col("__mx") === col("__mn"), lit(0L))
          .otherwise(least(floor((col("__v") - col("__mn")) / width),
            lit(nBuckets - 1L)).cast("long")))

    // Pass 2: bucket histogram (counts + in-bucket range) to the driver.
    val histRows = bucketed.groupBy(gcols :+ col("__b"): _*)
      .agg(count(lit(1)).as("__bc"), min("__v").as("__bmn"), max("__v").as("__bmx"))
      .collect()
    // group → buckets sorted by id, with cumulative end counts
    val hist: Map[Seq[Any], Array[(Long, Long, Long, Double, Double)]] =
      histRows.groupBy(_.toSeq.take(k)).map { case (g, rs) =>
        val sorted = rs.map(r => (r.getLong(k), r.getLong(k + 1),
          r.getDouble(k + 2), r.getDouble(k + 3))).sortBy(_._1)
        var cum = 0L
        g -> sorted.map { case (b, c, bmn, bmx) =>
          cum += c; (b, c, cum, bmn, bmx)
        }
      }

    // Locate every needed rank (binary search over the cumulative bucket
    // counts). A degenerate bucket (min == max) answers on the spot;
    // mixed-value buckets record the in-bucket offsets pass 3 must rank.
    val refineOffsets =
      scala.collection.mutable.Map[(Seq[Any], Long), Set[Long]]()
    val rankVals = scala.collection.mutable.Map[(Seq[Any], Long), Double]()
    for ((g, pts) <- targets) {
      val bs = hist(g)
      val ranks = pts.flatMap { case (_, lo, hi) => Seq(lo, hi) }.distinct
      for (rank <- ranks) {
        // first bucket whose cumulative end reaches the rank
        val i = {
          var lo = 0; var hi = bs.length - 1
          while (lo < hi) {
            val mid = (lo + hi) / 2
            if (bs(mid)._3 >= rank) hi = mid else lo = mid + 1
          }
          lo
        }
        val (b, c, cumEnd, bmn, bmx) = bs(i)
        if (bmn == bmx) rankVals((g, rank)) = bmn
        else {
          val off = rank - (cumEnd - c)
          refineOffsets((g, b)) = refineOffsets.getOrElse((g, b), Set.empty) + off
        }
      }
    }

    // Pass 3: rank only mixed-value target buckets. The row_number
    // window partitions by (group, bucket) — a bucket-sized spillable
    // sort; ties among equal values select the same VALUE either way.
    if (refineOffsets.nonEmpty) {
      val needRows = refineOffsets.toSeq.flatMap { case ((g, b), offs) =>
        offs.toSeq.map(off => Row.fromSeq(g ++ Seq(b, off)))
      }
      val needDf = spark.createDataFrame(
        java.util.Arrays.asList(needRows: _*),
        StructType(gFields ++ Seq(StructField("__b", org.apache.spark.sql.types.LongType),
          StructField("__off", org.apache.spark.sql.types.LongType))))
      val bKeys = gNames :+ "__b"
      val picked = bucketed
        .join(broadcast(needDf.select((bKeys.map(col)): _*).distinct()), bKeys)
        .withColumn("__rn", row_number()
          .over(Window.partitionBy(bKeys.map(col): _*).orderBy(col("__v")))
          .cast("long"))
        .join(broadcast(needDf), bKeys)
        .filter(col("__rn") === col("__off"))
        .select(gcols ++ Seq(col("__b"), col("__off"), col("__v")): _*)
        .collect()
      picked.foreach { r =>
        val g = r.toSeq.take(k)
        val b = r.getLong(k)
        val off = r.getLong(k + 1)
        val v = r.getDouble(k + 2)
        // translate (bucket, offset) back to the global rank(s) it serves
        val bs = hist(g)
        val cumBefore = bs.find(_._1 == b).map(e => e._3 - e._2).get
        rankVals((g, cumBefore + off)) = v
      }
    }

    // Assemble: Spark's exact interpolation arithmetic per (group, p).
    val out = targets.toSeq.map { case (g, pts) =>
      val vals = pts.map { case (pos, loRank, hiRank) =>
        val vlo = rankVals((g, loRank))
        if (loRank == hiRank) vlo
        else {
          val vhi = rankVals((g, hiRank))
          (hiRank - 1 - pos) * vlo + (pos - (loRank - 1)) * vhi
        }
      }
      Row.fromSeq(g ++ vals)
    }
    outDf(out)
  }
}
