package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Ann
import graft.streaming.StreamingIvfUpsert.{IndexRow, VecChange}

/** The streaming IVF maintenance fold is a max over a total order on
  * writes, so any micro-batch split and any at-least-once replay must
  * converge to [[Ann.ivfIndexUpsert]] applied to the folded change set
  * at the same frozen centroids — including equal-writetime
  * value/value and value/tombstone ties, which a strict
  * newer-writetime-wins fold would resolve by arrival order.
  */
class StreamingIvfUpsertSpec extends SparkSpec {

  private val dims = 4

  private def f(id: Long): Array[Float] =
    Array((id % 5 + 1).toFloat, (id % 3).toFloat, (id % 7).toFloat, 1f)

  private def g(id: Long, i: Int): Array[Float] =
    Array((id % 7 + 1).toFloat, (i + 1).toFloat, ((id * i) % 5).toFloat, 1f)

  /** Frozen centroid set: 4 axis-ish vectors, ids 0..3. */
  private val centroids: Seq[(Long, Array[Float])] = Seq(
    0L -> Array(1f, 0f, 0f, 0f), 1L -> Array(0f, 1f, 0f, 0f),
    2L -> Array(0f, 0f, 1f, 0f), 3L -> Array(0f, 0f, 0f, 1f))

  /** prev snapshot: ids 0..19. */
  private val prevMap: Map[Long, Array[Float]] =
    (0L until 20L).map(id => id -> f(id)).toMap

  /** Change feed over ids 10..24 (overlap + inserts): competing
    * writetimes per id, equal-writetime value/value ties (ids % 4 == 1)
    * and value/tombstone ties (ids % 5 == 0), shuffled with a fixed
    * seed.
    */
  private def changes: Seq[VecChange] = {
    val base = for {
      id <- 10L until 25L
      i <- 0 until 3
    } yield VecChange(id, g(id, i), (id + i * 3) % 7)
    val valueTies = for (id <- (10L until 25L).filter(_ % 4 == 1))
      yield Seq(VecChange(id, g(id, 7), 100L), VecChange(id, g(id, 8), 100L))
    val tombTies = for (id <- (10L until 25L).filter(_ % 5 == 0))
      yield VecChange(id, null, 100L)
    new scala.util.Random(7).shuffle(base ++ valueTies.flatten ++ tombTies)
  }

  /** The documented total order: writetime asc, tombstone beats value,
    * then lexicographically greater vector.
    */
  private def beats(ch: VecChange, cur: VecChange): Boolean =
    ch.writetime > cur.writetime || (ch.writetime == cur.writetime && {
      if (ch.vec == null) cur.vec != null
      else cur.vec != null && StreamingIvfUpsert.vecGt(ch.vec, cur.vec)
    })

  private def foldChanges(cs: Seq[VecChange]): Map[Long, Option[Array[Float]]] =
    cs.groupBy(_.vec_id).map { case (id, grp) =>
      id -> Option(grp.reduceLeft((a, b) => if (beats(b, a)) b else a).vec)
    }

  private def toDf(m: Map[Long, Array[Float]]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    m.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
  }

  /** The batch truth: base = ivfAssign(prev), upserted with the folded
    * change set applied as the curr snapshot, all at the frozen
    * centroids. Returns id -> centroid_id.
    */
  private def batchIndex(): Map[Long, Long] = {
    val winners = foldChanges(changes)
    val currMap = winners.foldLeft(prevMap) {
      case (m, (id, Some(v))) => m.updated(id, v)
      case (m, (id, None))    => m - id
    }
    val prevDf = toDf(prevMap)
    val centsDf = toDf(centroids.toMap)
    val base = prevDf.select(col("vec_id"), col("embedding").as("v"))
      .join(Ann.ivfAssign(prevDf, centsDf, "vec_id", "embedding",
        "vec_id", "embedding").select("vec_id", "centroid_id"), "vec_id")
    Ann.ivfIndexUpsert(base, prevDf, toDf(currMap), centsDf,
        "vec_id", "embedding", "vec_id", "embedding")
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Base assignments overlaid with the stream's final per-id emissions
    * (tombstones remove, assignments override) — the index a compacting
    * sink would hold.
    */
  private def applyStreamed(queryName: String): Map[Long, Long] = {
    val spark0 = spark
    import spark0.implicits._
    val prevDf = toDf(prevMap)
    val centsDf = toDf(centroids.toMap)
    val baseAssign = Ann.ivfAssign(prevDf, centsDf, "vec_id", "embedding",
        "vec_id", "embedding").select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val finalRows = spark.table(queryName).as[IndexRow].collect()
      .zipWithIndex.groupBy(_._1.vec_id)
      .map { case (id, grp) => id -> grp.maxBy(_._2)._1 }
    finalRows.values.foldLeft(baseAssign) { (m, r) =>
      if (r.deleted) m - r.vec_id else m.updated(r.vec_id, r.centroid_id)
    }
  }

  test("shuffled micro-batch splits converge to the batch upsert") {
    val spark0 = spark
    import spark0.implicits._
    val cs = changes
    val in = MemoryStream[VecChange](spark)
    val q = StreamingIvfUpsert.indexStream(in.toDS(), centroids)
      .writeStream.format("memory").queryName("ivf_stream")
      .outputMode("update").start()
    try {
      val (a, rest) = cs.splitAt(cs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData(c); q.processAllAvailable()
    } finally q.stop()
    assert(applyStreamed("ivf_stream") === batchIndex())
  }

  test("full at-least-once replay changes nothing") {
    val spark0 = spark
    import spark0.implicits._
    val cs = changes
    val in = MemoryStream[VecChange](spark)
    val q = StreamingIvfUpsert.indexStream(in.toDS(), centroids)
      .writeStream.format("memory").queryName("ivf_replay")
      .outputMode("update").start()
    try {
      in.addData(cs); q.processAllAvailable()
      in.addData(cs.reverse); q.processAllAvailable() // full replay
    } finally q.stop()
    assert(applyStreamed("ivf_replay") === batchIndex())
  }

  test("equal-writetime ties resolve by the documented order, not arrival") {
    val spark0 = spark
    import spark0.implicits._
    val lo = Array(1f, 2f, 3f, 4f)
    val hi = Array(1f, 2f, 3.5f, 0f) // lexicographically greater than lo
    val tie = Seq(
      VecChange(100L, lo, 5L), VecChange(100L, hi, 5L), // value/value tie
      VecChange(101L, hi, 5L), VecChange(101L, null, 5L)) // value/tombstone
    def run(name: String, ordered: Seq[VecChange]): Map[Long, (Long, Boolean)] = {
      val in = MemoryStream[VecChange](spark)
      val q = StreamingIvfUpsert.indexStream(in.toDS(), centroids)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        // one element per micro-batch: the worst-case split
        ordered.foreach { ch => in.addData(ch); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[IndexRow].collect().zipWithIndex
        .groupBy(_._1.vec_id)
        .map { case (id, grp) =>
          val last = grp.maxBy(_._2)._1
          id -> ((last.centroid_id, last.deleted))
        }
    }
    val fwd = run("ivf_tie_fwd", tie)
    val rev = run("ivf_tie_rev", tie.reverse)
    assert(fwd === rev)
    // greater vector wins the value tie; tombstone wins over the value
    val hiCid = fwd(100L)._1
    assert(!fwd(100L)._2)
    val expect = centroids.map { case (cid, cv) =>
      (Ann.cosineLocal(hi, cv), cid)
    }.maxBy { case (c, cid) => (c, -cid) }._2
    assert(hiCid === expect)
    assert(fwd(101L) === ((-1L, true)))
  }
}
