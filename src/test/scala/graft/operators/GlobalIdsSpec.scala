package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Global-id assignment: contiguous, order-preserving, and identical at
  * any parallelism / bucket count — the properties that let it replace a
  * single-partition ROW_NUMBER window.
  */
class GlobalIdsSpec extends SparkSpec {
  import spark.implicits._

  private def ids(nBuckets: Int, parts: Int) = {
    // non-contiguous, shuffled keys: buckets see uneven, gappy ranges
    val keys = Seq(907L, 3L, 512L, 44L, 45L, 46L, 1000L, 0L, 999L, 17L,
      256L, 255L, 257L, 77L, 901L)
    GlobalIds.assign(keys.toDF("k").repartition(parts), "k", nBuckets)
      .select("k", "global_id").as[(Long, Long)].collect().sortBy(_._1)
  }

  test("ids are the 1-based rank of the key in ascending order") {
    val got = ids(nBuckets = 4, parts = 3)
    val want = got.map(_._1).sorted.zipWithIndex
      .map { case (k, i) => (k, i + 1L) }
    assert(got.toSeq == want.toSeq)
  }

  test("identical ids at any bucket count and partitioning") {
    val base = ids(nBuckets = 4, parts = 3).toSeq
    assert(ids(nBuckets = 1, parts = 1).toSeq == base)
    assert(ids(nBuckets = 64, parts = 7).toSeq == base)
  }

  test("empty input yields no rows, null-typed id column") {
    val out = GlobalIds.assign(Seq.empty[Long].toDF("k"), "k")
    assert(out.count() == 0)
    assert(out.columns.contains("global_id"))
  }
}
