package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: deterministic key salting.
  *
  * AQE's skew-join splitting (on by default) handles most cases at
  * runtime; explicit salting remains the tool when a single hot key
  * overwhelms even split partitions — e.g. a null-heavy join column or a
  * celebrity user_id. The left (large, skewed) side gets a deterministic
  * salt derived from its whole row; the right side is replicated once per
  * salt value. Join output is exactly the unsalted join's.
  */
object Skew {

  /** Equi-join with the left side salted `saltFactor` ways. Deterministic:
    * the salt hashes the left row's non-key columns (falling back to the
    * keys when there are none) rather than using rand(), so retries and
    * speculative tasks agree.
    *
    * Only left-preserving join types are allowed: the right side is
    * replicated per salt value, so right/full outer joins would emit each
    * unmatched right row saltFactor times.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports left-preserving join types only, got $joinType")
    val nonKey = left.columns.filterNot(keys.contains)
    val saltSource: Seq[Column] =
      (if (nonKey.nonEmpty) nonKey.toSeq else keys).map(col)
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltSource: _*), lit(saltFactor)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Bloom-prefiltered join: build a Bloom filter over the SMALL side's
    * join keys (driver-held, O(bits) not O(rows)) and drop big-side rows
    * the filter rejects BEFORE they enter the shuffle — the manual form
    * of Spark's runtime row-level filtering, pinned on deterministically.
    * False positives die in the exact join that follows, so the result is
    * IDENTICAL to the plain inner join (the oracle runs the plain join);
    * what changes is the shuffled big-side volume: ~matches + fpp·misses.
    * At 100 TB with a selective dimension this is the difference between
    * shuffling the fact table and shuffling a sliver of it. The probe is
    * the codegen'd BloomFilterMightContain — no UDF boundary on the scan.
    *
    * EAGER at construction: building the filter runs two Spark jobs over
    * the SMALL side (a distinct-count to size the filter, then the
    * bloomFilter aggregation) before any action on the returned frame —
    * cheap by the small-side contract, but not lazy like a plain join.
    */
  def bloomPrefilteredJoin(big: DataFrame, small: DataFrame,
                           bigKey: String, smallKey: String,
                           fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(smallKey)).distinct()
    val expected = math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(smallKey, expected, fpp)
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    // Alias both sides so the equi-join condition resolves even when the
    // two key columns share a name (unaliased col(k) === col(k) throws an
    // ambiguous-reference AnalysisException).
    val b = big.alias("__bloom_big")
    val s = small.alias("__bloom_small")
    val mightContain = org.apache.spark.sql.graft.GraftExpressions
      .bloomMightContain(bfBytes, col(s"__bloom_big.$bigKey"))
    b.filter(mightContain)
      .join(s, col(s"__bloom_big.$bigKey") === col(s"__bloom_small.$smallKey"))
  }
}
