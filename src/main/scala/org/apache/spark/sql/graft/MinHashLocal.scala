package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Driver/executor-local twin of the declarative LSH banding pipeline —
  * `TextDedup.bandedKeys(TextDedup.shingleHashTable(docs, id, text, n),
  * numPerm, bands)` — for callers that must band ONE document outside a
  * DataFrame plan (the streaming index-maintenance fold, where banding
  * runs inside `mapGroupsWithState`). Every step replicates the batch
  * arithmetic bit-for-bit, so streamed and batch band keys are
  * interchangeable (spec-verified):
  *
  *   - tokens: `split(text, " ")` with Spark's keep-trailing-empties
  *     semantics (`String.split(" ", -1)`);
  *   - shingles: space-joined n-grams, present only when the document
  *     has >= n tokens (mirroring `gramRows`' lead-window filter — a
  *     shorter document contributes NO banded rows, so this returns an
  *     empty array for it);
  *   - shingle hash: `xxhash64(s)` = XXH64 over the UTF-8 bytes, seed
  *     42, DISTINCT per document (shingleHashTable's `.distinct()`);
  *   - permutation minima and band keys: the exact [[MinHashAgg]]
  *     update/eval loops (hashLong(h, 42) -> hashInt(i, ·) minima;
  *     band = hashLong fold over the band's rows from seed 42).
  */
object MinHashLocal {

  /** Distinct shingle hashes of ONE document, SORTED ascending — the
    * local twin of `TextDedup.shingleHashTable`'s per-document rows
    * (same tokens/shingles/xxhash64-seed-42 arithmetic as [[bandKeys]];
    * the relation is a set, so the sorted array is its canonical form —
    * set equality ≡ array equality, and the canonical order makes the
    * streaming fold's lexicographic tie-break deterministic). A document
    * with fewer than `n` tokens returns an empty array, mirroring
    * `gramRows`' lead-window filter.
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    val toks = text.split(" ", -1)
    if (toks.length < n) return Array.emptyLongArray
    val seen = new java.util.TreeSet[java.lang.Long]()
    var s = 0
    while (s <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(s))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(s + j)); j += 1 }
      seen.add(XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L))
      s += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def bandKeys(text: String, n: Int, numPerm: Int, bands: Int): Array[Long] = {
    require(numPerm > 0 && bands > 0 && numPerm % bands == 0,
      "numPerm must be a positive multiple of bands")
    val toks = text.split(" ", -1)
    if (toks.length < n) return Array.emptyLongArray
    val seen = new java.util.HashSet[Long]()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var s = 0
    while (s <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(s))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(s + j)); j += 1 }
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      if (seen.add(h)) {
        val h1 = XXH64.hashLong(h, 42L)
        var i = 0
        while (i < numPerm) {
          val m = XXH64.hashInt(i, h1)
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      s += 1
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
