package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Doc-local JVM mirror of the relational shingle→minhash→band pipeline:
  * same split semantics as Spark's `split(text, " ")` (java regex,
  * limit -1), same shingle join (`concat_ws(" ", ...)`), same hash
  * (`xxhash64` seed 42 over UTF-8 bytes), same permutations and band fold
  * as [[MinHashAgg]] — so band keys computed per document in a typed map
  * (no shuffle; the streaming path) are bit-identical to the aggregate
  * form (spec-verified).
  */
object MinHashJvm {

  /** Distinct 64-bit hashes of the doc's word n-gram shingles. */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    val toks = text.split(" ", -1)
    if (toks.length < n) return Array.empty
    val out = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i <= toks.length - n) {
      val s = toks.slice(i, i + n).mkString(" ")
      val u = UTF8String.fromString(s)
      out.add(XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), 42L))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    arr
  }

  /** LSH band keys from shingle hashes — identical arithmetic to
    * [[MinHashAgg]] with `bands > 0` (permutation i of h =
    * XXH64.hashInt(i, XXH64.hashLong(h, 42)); band key = hashLong fold,
    * seed 42). Empty input yields the Long.MaxValue-identity fold, same
    * as the aggregate's absent-input buffer.
    */
  def bandKeys(hashes: Array[Long], numPerm: Int, bands: Int): Array[Long] = {
    require(numPerm > 0 && bands > 0 && numPerm % bands == 0,
      "numPerm must be a positive multiple of bands")
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var k = 0
    while (k < hashes.length) {
      val h1 = XXH64.hashLong(hashes(k), 42L)
      var i = 0
      while (i < numPerm) {
        val m = XXH64.hashInt(i, h1)
        if (m < mins(i)) mins(i) = m
        i += 1
      }
      k += 1
    }
    val rpb = numPerm / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var r = 0
      while (r < rpb) { h = XXH64.hashLong(mins(b * rpb + r), h); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }
}
