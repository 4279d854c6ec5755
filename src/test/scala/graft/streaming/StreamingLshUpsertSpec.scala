package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.MinHashLocal

import graft.SparkSpec
import graft.operators.TextDedup
import graft.streaming.StreamingLshUpsert.{BandedRow, DocChange}

/** The streaming LSH maintenance fold is a max over a total order on
  * writes, and its stateless re-band uses arithmetic bit-identical to
  * the declarative banding pipeline — so any micro-batch split and any
  * at-least-once replay, overlaid on the standing banded relation, must
  * equal the maintained banded side of [[TextDedup.upsertLshPairs]] on
  * the folded change set. Ties at equal writetime (value/value and
  * value/tombstone) must resolve by the documented order, not arrival.
  */
class StreamingLshUpsertSpec extends SparkSpec {

  private val N = 3
  private val numPerm = 64
  private val bands = 16

  private val vocab = Array("the", "quick", "brown", "fox", "jumps",
    "over", "lazy", "dog", "stream", "index")

  private def f(id: Long): String =
    (0 until 8).map(i => vocab(((id + i) % 10).toInt)).mkString(" ")

  private def g(id: Long, i: Int): String = i match {
    // a short doc (< n tokens -> empty bands) and a double-space doc
    // (split keeps the empty token) keep the parity honest
    case 7 => "tiny doc"
    case 8 => vocab((id % 10).toInt) + "  " + f(id + 1)
    case _ => (0 until 8).map(j => vocab(((id * (i + 2) + j) % 10).toInt))
      .mkString(" ")
  }

  /** prev snapshot: ids 0..19. */
  private val prevMap: Map[Long, String] =
    (0L until 20L).map(id => id -> f(id)).toMap

  /** Change feed over ids 10..24 (overlap + inserts): competing
    * writetimes per id (distinct mod 7 per id), equal-writetime
    * value/value ties (ids % 4 == 1, one of them the double-space text,
    * one id's pair including the short doc) and value/tombstone ties
    * (ids % 5 == 0), shuffled with a fixed seed.
    */
  private def changes: Seq[DocChange] = {
    val base = for {
      id <- 10L until 25L
      i <- 0 until 3
    } yield DocChange(id, g(id, i), (id + i * 3) % 7)
    val valueTies = for (id <- (10L until 25L).filter(_ % 4 == 1))
      yield Seq(DocChange(id, g(id, 7), 100L), DocChange(id, g(id, 8), 100L))
    val tombTies = for (id <- (10L until 25L).filter(_ % 5 == 0))
      yield DocChange(id, null, 100L)
    // one id whose WINNER is the short doc: a live index row with zero
    // band keys, the batch pipeline's document-absent case
    val shortWin = Seq(DocChange(22L, "tiny doc", 50L))
    new scala.util.Random(11)
      .shuffle(base ++ valueTies.flatten ++ tombTies ++ shortWin)
  }

  /** The documented total order: writetime asc, tombstone beats value,
    * then lexicographically greater band array.
    */
  private def beats(ch: DocChange, cur: DocChange): Boolean = {
    def bk(t: String): Array[Long] = MinHashLocal.bandKeys(t, N, numPerm, bands)
    ch.writetime > cur.writetime || (ch.writetime == cur.writetime && {
      if (ch.text == null) cur.text != null
      else cur.text != null &&
        StreamingLshUpsert.arrGt(bk(ch.text), bk(cur.text))
    })
  }

  private def foldChanges(cs: Seq[DocChange]): Map[Long, Option[String]] =
    cs.groupBy(_.doc_id).map { case (id, grp) =>
      id -> Option(grp.reduceLeft((a, b) => if (beats(b, a)) b else a).text)
    }

  private def toDf(m: Map[Long, String]): DataFrame = {
    val spark0 = spark
    import spark0.implicits._
    m.toSeq.sortBy(_._1).toDF("doc_id", "text")
  }

  private def bandedSet(df: DataFrame): Set[(Long, Int, Long)] =
    df.select(col("doc_id"), col("band"), col("bh")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  /** The batch truth: the maintained banded relation from
    * [[TextDedup.upsertLshPairs]] applied to the folded change set.
    */
  private def batchBanded(): Set[(Long, Int, Long)] = {
    val winners = foldChanges(changes)
    val currMap = winners.foldLeft(prevMap) {
      case (m, (id, Some(t))) => m.updated(id, t)
      case (m, (id, None))    => m - id
    }
    val spark0 = spark
    import spark0.implicits._
    val prevDf = toDf(prevMap)
    val prevBanded = TextDedup.bandedKeys(
      TextDedup.shingleHashTable(prevDf, "doc_id", "text", N), numPerm, bands)
    val prevPairs = TextDedup.minhashLshPairs(
      prevDf, "doc_id", "text", N, numPerm, bands, 0.8)
    val changedIds = winners.collect { case (id, Some(_)) => id }
      .toSeq.toDF("doc_id")
    val removedIds = winners.collect {
      case (id, None) if prevMap.contains(id) => id }.toSeq.toDF("doc_id")
    val (_, newBanded, _) = TextDedup.upsertLshPairs(
      prevPairs, prevBanded, toDf(currMap), changedIds, removedIds,
      "doc_id", "text", N, numPerm, bands, 0.8)
    bandedSet(newBanded)
  }

  /** Standing banded relation overlaid with the stream's final per-id
    * emissions (tombstones remove, winners replace) — the banded index a
    * compacting sink would hold.
    */
  private def applyStreamed(queryName: String): Set[(Long, Int, Long)] = {
    val spark0 = spark
    import spark0.implicits._
    val prevBanded = bandedSet(TextDedup.bandedKeys(
      TextDedup.shingleHashTable(toDf(prevMap), "doc_id", "text", N),
      numPerm, bands))
    val finalRows = spark.table(queryName).as[BandedRow].collect()
      .zipWithIndex.groupBy(_._1.doc_id)
      .map { case (id, grp) => id -> grp.maxBy(_._2)._1 }
    val touched = finalRows.keySet
    prevBanded.filterNot(r => touched.contains(r._1)) ++
      finalRows.values.filterNot(_.deleted).flatMap { r =>
        r.bands.zipWithIndex.map { case (bh, b) => (r.doc_id, b, bh) }
      }
  }

  test("local banding matches the declarative pipeline bit-for-bit") {
    val spark0 = spark
    import spark0.implicits._
    val texts = Seq(f(3), g(4, 0), g(5, 8), "tiny doc", "", "one two three")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val declarative = bandedSet(TextDedup.bandedKeys(
      TextDedup.shingleHashTable(df, "doc_id", "text", N), numPerm, bands))
    val local = texts.zipWithIndex.flatMap { case (t, i) =>
      MinHashLocal.bandKeys(t, N, numPerm, bands).zipWithIndex
        .map { case (bh, b) => (i.toLong, b, bh) }
    }.toSet
    assert(local === declarative)
  }

  test("shuffled micro-batch splits converge to the upsert banded relation") {
    val spark0 = spark
    import spark0.implicits._
    val cs = changes
    val in = MemoryStream[DocChange](spark)
    val q = StreamingLshUpsert.bandedStream(in.toDS(), N, numPerm, bands)
      .writeStream.format("memory").queryName("lsh_stream")
      .outputMode("update").start()
    try {
      val (a, rest) = cs.splitAt(cs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData(c); q.processAllAvailable()
    } finally q.stop()
    assert(applyStreamed("lsh_stream") === batchBanded())
  }

  test("full at-least-once replay changes nothing") {
    val spark0 = spark
    import spark0.implicits._
    val cs = changes
    val in = MemoryStream[DocChange](spark)
    val q = StreamingLshUpsert.bandedStream(in.toDS(), N, numPerm, bands)
      .writeStream.format("memory").queryName("lsh_replay")
      .outputMode("update").start()
    try {
      in.addData(cs); q.processAllAvailable()
      in.addData(cs.reverse); q.processAllAvailable() // full replay
    } finally q.stop()
    assert(applyStreamed("lsh_replay") === batchBanded())
  }

  test("equal-writetime ties resolve by the documented order, not arrival") {
    val spark0 = spark
    import spark0.implicits._
    val lo = f(1)
    val hi = f(2)
    val (loT, hiT) = {
      val a = MinHashLocal.bandKeys(lo, N, numPerm, bands)
      val b = MinHashLocal.bandKeys(hi, N, numPerm, bands)
      if (StreamingLshUpsert.arrGt(a, b)) (hi, lo) else (lo, hi)
    }
    val tie = Seq(
      DocChange(100L, loT, 5L), DocChange(100L, hiT, 5L), // value/value
      DocChange(101L, hiT, 5L), DocChange(101L, null, 5L)) // value/tombstone
    def run(name: String, ordered: Seq[DocChange]): Map[Long, (Seq[Long], Boolean)] = {
      val in = MemoryStream[DocChange](spark)
      val q = StreamingLshUpsert.bandedStream(in.toDS(), N, numPerm, bands)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        // one element per micro-batch: the worst-case split
        ordered.foreach { ch => in.addData(ch); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[BandedRow].collect().zipWithIndex
        .groupBy(_._1.doc_id)
        .map { case (id, grp) =>
          val last = grp.maxBy(_._2)._1
          id -> ((last.bands.toSeq, last.deleted))
        }
    }
    val fwd = run("lsh_tie_fwd", tie)
    val rev = run("lsh_tie_rev", tie.reverse)
    assert(fwd === rev)
    // the greater band array wins the value tie; tombstone beats value
    assert(!fwd(100L)._2)
    assert(fwd(100L)._1 ===
      MinHashLocal.bandKeys(hiT, N, numPerm, bands).toSeq)
    assert(fwd(101L) === ((Seq.empty[Long], true)))
  }
}
