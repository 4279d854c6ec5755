package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** knnEdgeIndexUpsert must be row-identical to a full rebuild of the new
  * corpus at the frozen centroid set across the I/U/D diff shapes, while
  * provably CARRYING OVER (not recomputing) unaffected buckets — the
  * edge-relation face of the maintained-index discipline.
  */
class KnnEdgeUpsertSpec extends SparkSpec {

  private val K = 2

  /** Four well-separated clusters along the first four axes; member
    * vectors tilt by a small id-dependent epsilon in a FIFTH dimension,
    * so within-cluster cosines are distinct and deterministic while the
    * nearest centroid stays the cluster's axis.
    */
  private def vec(cluster: Int, eps: Float): Array[Float] = {
    val v = Array.fill(5)(0.0f)
    v(cluster) = 1.0f
    v(4) = eps
    v
  }

  private def centroidRows: Seq[(Long, Array[Float])] =
    (0 until 4).map(i => (100L + i, vec(i, 0.0f)))

  // prev: ids 1-12 in cluster id%4 (3 members each), eps = id/100
  private def prevRows: Seq[(Long, Array[Float])] =
    (1L to 12L).map(id => (id, vec((id % 4).toInt, id.toFloat / 100)))

  // diff: update id 4 (cluster 0, new eps), delete id 5 (cluster 1),
  // insert id 13 (cluster 0); clusters 2 and 3 UNTOUCHED
  private def currRows: Seq[(Long, Array[Float])] =
    prevRows.filterNot(_._1 == 5L).map {
      case (4L, _) => (4L, vec(0, 0.31f))
      case r       => r
    } :+ (13L, vec(0, 0.13f))

  private def df(rows: Seq[(Long, Array[Float])]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private def edgeSet(d: DataFrame): Set[(Long, Long, Long, Double, Long)] =
    d.select(col("query_id"), col("neighbor_id"), col("rank"), col("cosine"),
        col("centroid_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSet

  private def pieces() = {
    val prev = df(prevRows)
    val curr = df(currRows)
    val cents = df(centroidRows)
    val assignPrev = Ann.ivfAssign(prev, cents, "vec_id", "embedding",
      "vec_id", "embedding")
    val base = Ann.knnGraphWithCentroid(prev, assignPrev,
      "vec_id", "embedding", K)
    val baseIvf = prev.select(col("vec_id"), col("embedding").as("v"))
      .join(assignPrev.select("vec_id", "centroid_id"), "vec_id")
    val currIdx = Ann.ivfIndexUpsert(baseIvf, prev, curr, cents,
      "vec_id", "embedding", "vec_id", "embedding")
    (prev, curr, cents, base, currIdx)
  }

  test("upserted edges equal a full rebuild at the frozen centroids") {
    val (prev, curr, cents, base, currIdx) = pieces()
    val upserted = Ann.knnEdgeIndexUpsert(base, currIdx, prev, curr, cents,
      "vec_id", "embedding", "vec_id", "embedding", K)
    val rebuilt = Ann.knnGraphWithCentroid(curr,
      Ann.ivfAssign(curr, cents, "vec_id", "embedding", "vec_id", "embedding"),
      "vec_id", "embedding", K)
    val got = edgeSet(upserted)
    val want = edgeSet(rebuilt)
    assert(got === want)
    // the diff shapes really bite: deleted 5 is gone as query AND
    // neighbor; inserted 13 has edges; updated 4's edges reflect new eps
    assert(!got.exists(e => e._1 == 5L || e._2 == 5L))
    assert(got.exists(_._1 == 13L))
    assert(got.nonEmpty)
  }

  test("untouched buckets are CARRIED OVER, not recomputed") {
    val (prev, curr, cents, base, currIdx) = pieces()
    // poison an untouched bucket's cosines (clusters 2/3: centroids 102,
    // 103) — a recompute would heal them, carry-over keeps the poison
    val poisoned = base.withColumn("cosine",
      when(col("centroid_id") >= 102L, lit(9.99)).otherwise(col("cosine")))
    val upserted = Ann.knnEdgeIndexUpsert(poisoned, currIdx, prev, curr,
      cents, "vec_id", "embedding", "vec_id", "embedding", K)
    val got = edgeSet(upserted)
    val touched = got.filter(_._5 < 102L)
    val carried = got.filter(_._5 >= 102L)
    assert(carried.nonEmpty && carried.forall(_._4 == 9.99),
      s"untouched buckets were recomputed: $carried")
    // and the touched buckets still equal the rebuild's touched slice
    val want = edgeSet(Ann.knnGraphWithCentroid(curr,
      Ann.ivfAssign(curr, cents, "vec_id", "embedding", "vec_id", "embedding"),
      "vec_id", "embedding", K)).filter(_._5 < 102L)
    assert(touched === want)
  }

  test("empty diff leaves the base untouched") {
    val (prev, _, cents, base, _) = pieces()
    val assignPrev = Ann.ivfAssign(prev, cents, "vec_id", "embedding",
      "vec_id", "embedding")
    val baseIvf = prev.select(col("vec_id"), col("embedding").as("v"))
      .join(assignPrev.select("vec_id", "centroid_id"), "vec_id")
    val upserted = Ann.knnEdgeIndexUpsert(base, baseIvf, prev, prev, cents,
      "vec_id", "embedding", "vec_id", "embedding", K)
    assert(edgeSet(upserted) === edgeSet(base))
  }
}
