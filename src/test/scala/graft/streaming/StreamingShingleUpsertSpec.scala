package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.MinHashLocal

import graft.SparkSpec
import graft.operators.TextDedup
import graft.streaming.StreamingShingleUpsert.{DocChange, ShingleRow}

/** The streaming shingle-index fold is a max over a total order on
  * writes, and its stateless re-shingle uses arithmetic bit-identical
  * to the declarative `shingleHashTable` pipeline — so any micro-batch
  * split and any at-least-once replay, overlaid on the standing
  * (doc_id, h) relation, must equal `shingleHashTable` of the folded
  * corpus. Ties at equal writetime (value/value and value/tombstone)
  * must resolve by the documented order, not arrival.
  */
class StreamingShingleUpsertSpec extends SparkSpec {

  private val N = 3

  private val vocab = Array("the", "quick", "brown", "fox", "jumps",
    "over", "lazy", "dog", "stream", "index")

  private def f(id: Long): String =
    (0 until 8).map(i => vocab(((id + i) % 10).toInt)).mkString(" ")

  private def g(id: Long, i: Int): String = i match {
    // a short doc (< n tokens -> empty hashes) and a double-space doc
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
    * writetimes per id, equal-writetime value/value ties (ids % 4 == 1)
    * and value/tombstone ties (ids % 5 == 0), one short-doc winner,
    * shuffled with a fixed seed.
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
    val shortWin = Seq(DocChange(22L, "tiny doc", 50L))
    new scala.util.Random(13)
      .shuffle(base ++ valueTies.flatten ++ tombTies ++ shortWin)
  }

  /** The documented total order: writetime asc, tombstone beats value,
    * then lexicographically greater (canonical sorted) hash array.
    */
  private def beats(ch: DocChange, cur: DocChange): Boolean = {
    def sh(t: String): Array[Long] = MinHashLocal.shingleHashes(t, N)
    ch.writetime > cur.writetime || (ch.writetime == cur.writetime && {
      if (ch.text == null) cur.text != null
      else cur.text != null &&
        StreamingLshUpsert.arrGt(sh(ch.text), sh(cur.text))
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

  private def hashSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id"), col("h")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The batch truth: `shingleHashTable` of the folded corpus. */
  private def batchShingles(): Set[(Long, Long)] = {
    val winners = foldChanges(changes)
    val currMap = winners.foldLeft(prevMap) {
      case (m, (id, Some(t))) => m.updated(id, t)
      case (m, (id, None))    => m - id
    }
    hashSet(TextDedup.shingleHashTable(toDf(currMap), "doc_id", "text", N))
  }

  /** Standing (doc_id, h) relation overlaid with the stream's final
    * per-id emissions (tombstones remove, winners replace) — the index
    * a compacting sink would hold.
    */
  private def applyStreamed(queryName: String): Set[(Long, Long)] = {
    val spark0 = spark
    import spark0.implicits._
    val prevSh = hashSet(
      TextDedup.shingleHashTable(toDf(prevMap), "doc_id", "text", N))
    val finalRows = spark.table(queryName).as[ShingleRow].collect()
      .zipWithIndex.groupBy(_._1.doc_id)
      .map { case (id, grp) => id -> grp.maxBy(_._2)._1 }
    val touched = finalRows.keySet
    prevSh.filterNot(r => touched.contains(r._1)) ++
      finalRows.values.filterNot(_.deleted)
        .flatMap(r => r.hashes.map(h => (r.doc_id, h)))
  }

  test("local shingling matches the declarative pipeline bit-for-bit") {
    val spark0 = spark
    import spark0.implicits._
    val texts = Seq(f(3), g(4, 0), g(5, 8), "tiny doc", "", "one two three",
      f(6) + " " + f(6)) // repeated text exercises the distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val declarative = hashSet(
      TextDedup.shingleHashTable(df, "doc_id", "text", N))
    val local = texts.zipWithIndex.flatMap { case (t, i) =>
      MinHashLocal.shingleHashes(t, N).map(h => (i.toLong, h))
    }.toSet
    assert(local === declarative)
    // and the local arrays really are canonical: sorted, distinct
    for (t <- texts) {
      val a = MinHashLocal.shingleHashes(t, N)
      assert(a.toSeq === a.toSeq.sorted && a.toSet.size === a.length)
    }
  }

  test("shuffled micro-batch splits converge to the folded shingle relation") {
    val spark0 = spark
    import spark0.implicits._
    val cs = changes
    val in = MemoryStream[DocChange](spark)
    val q = StreamingShingleUpsert.shingleStream(in.toDS(), N)
      .writeStream.format("memory").queryName("shingle_stream")
      .outputMode("update").start()
    try {
      val (a, rest) = cs.splitAt(cs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      in.addData(a); q.processAllAvailable()
      in.addData(b); q.processAllAvailable()
      in.addData(c); q.processAllAvailable()
    } finally q.stop()
    assert(applyStreamed("shingle_stream") === batchShingles())
  }

  test("full at-least-once replay changes nothing") {
    val spark0 = spark
    import spark0.implicits._
    val cs = changes
    val in = MemoryStream[DocChange](spark)
    val q = StreamingShingleUpsert.shingleStream(in.toDS(), N)
      .writeStream.format("memory").queryName("shingle_replay")
      .outputMode("update").start()
    try {
      in.addData(cs); q.processAllAvailable()
      in.addData(cs.reverse); q.processAllAvailable() // full replay
    } finally q.stop()
    assert(applyStreamed("shingle_replay") === batchShingles())
  }

  test("equal-writetime ties resolve by the documented order, not arrival") {
    val spark0 = spark
    import spark0.implicits._
    val lo = f(1)
    val hi = f(2)
    val (loT, hiT) = {
      val a = MinHashLocal.shingleHashes(lo, N)
      val b = MinHashLocal.shingleHashes(hi, N)
      if (StreamingLshUpsert.arrGt(a, b)) (hi, lo) else (lo, hi)
    }
    val tie = Seq(
      DocChange(100L, loT, 5L), DocChange(100L, hiT, 5L), // value/value
      DocChange(101L, hiT, 5L), DocChange(101L, null, 5L)) // value/tombstone
    def run(name: String, ordered: Seq[DocChange]): Map[Long, (Seq[Long], Boolean)] = {
      val in = MemoryStream[DocChange](spark)
      val q = StreamingShingleUpsert.shingleStream(in.toDS(), N)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        // one element per micro-batch: the worst-case split
        ordered.foreach { ch => in.addData(ch); q.processAllAvailable() }
      } finally q.stop()
      spark.table(name).as[ShingleRow].collect().zipWithIndex
        .groupBy(_._1.doc_id)
        .map { case (id, grp) =>
          val last = grp.maxBy(_._2)._1
          id -> ((last.hashes.toSeq, last.deleted))
        }
    }
    val fwd = run("shingle_tie_fwd", tie)
    val rev = run("shingle_tie_rev", tie.reverse)
    assert(fwd === rev)
    // the greater hash array wins the value tie; tombstone beats value
    assert(!fwd(100L)._2)
    assert(fwd(100L)._1 === MinHashLocal.shingleHashes(hiT, N).toSeq)
    assert(fwd(101L) === ((Seq.empty[Long], true)))
  }
}
