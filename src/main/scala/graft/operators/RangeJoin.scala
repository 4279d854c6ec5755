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
}
