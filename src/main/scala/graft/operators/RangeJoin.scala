package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join. Spark plans a raw inequality join as a
  * broadcast-nested-loop — O(|points| x |intervals|). The scalable
  * re-expression buckets time: points land in bucket t div W, intervals
  * explode into every bucket they overlap, and the join becomes an
  * EQUI-join on the bucket plus a residual filter. Cost is proportional to
  * true overlap density, and the shuffle key is the bucket, so skew
  * follows the time distribution (salt or shrink W if one bucket is hot).
  */
object RangeJoin {

  /** Points joined to the intervals containing them (closed bounds:
    * start <= t <= end). `bucketUs` should be on the order of the typical
    * interval length — too small explodes intervals into many buckets, too
    * big degrades the residual filter selectivity.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, startCol: String, endCol: String,
                      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val p = points.withColumn("__bucket", expr(s"$pointTs div $bucketUs"))
    val i = intervals.withColumn("__bucket",
      explode(expr(s"sequence($startCol div $bucketUs, $endCol div $bucketUs)")))
    p.join(i, "__bucket")
      .filter(col(startCol) <= col(pointTs) && col(pointTs) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval-interval overlap join (closed bounds: pairs with
    * `lStart <= rEnd && rStart <= lEnd`) — the session-vs-incident /
    * exposure-vs-outage shape where BOTH sides are large, so neither
    * broadcasts and a raw inequality join would go nested-loop. Same
    * bucketing as [[pointInInterval]], with a duplicate-free twist: both
    * intervals of an overlapping pair always cover the bucket holding
    * `max(lStart, rStart)` (the overlap's first instant), so keeping only
    * the join hit in THAT bucket yields each pair exactly once — no
    * DISTINCT over the pair relation, which at scale would be a second
    * full shuffle of the output.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String,
                      rStart: String, rEnd: String,
                      bucketUs: Long): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    val l = left.withColumn("__bucket",
      explode(expr(s"sequence($lStart div $bucketUs, $lEnd div $bucketUs)")))
    val r = right.withColumn("__bucket",
      explode(expr(s"sequence($rStart div $bucketUs, $rEnd div $bucketUs)")))
    l.join(r, "__bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === expr(s"greatest($lStart, $rStart) div $bucketUs"))
      .drop("__bucket")
  }
}
