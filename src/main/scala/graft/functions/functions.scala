package graft

import org.apache.spark.sql.Column

import graft.operators.{Cdc, TextAnalysis, TextDedup, Transforms}

/** User-facing column-function surface — the library's analogue of
  * `org.apache.spark.sql.functions`: one import gives every scalar
  * capability graft adds on top of Spark.
  *
  * {{{
  *   import graft.functions._
  *   df.select(tile(col("pk"), 64), hashColumn(col("email"), "sha256"))
  * }}}
  */
object functions {

  /** Deterministic tile/work-unit id from a primary-key column
    * (xxhash64-based production variant).
    */
  def tile(pk: Column, totalTiles: Int): Column =
    Cdc.tileXxhash64(Seq(pk), totalTiles)

  /** Engine-portable md5-based tile variant (reproducible in any SQL
    * engine; used by the cross-engine oracles).
    */
  def tilePortable(pk: Column, totalTiles: Int): Column =
    Cdc.tileMd5(pk, totalTiles)

  /** Column hashing by rule name: md5, sha1, sha256, xxhash64, murmur3. */
  def hashColumn(c: Column, rule: String): Column = Transforms.hashColumn(c, rule)

  /** DynamoDB-style composite key: values joined by a separator. */
  def compositeKey(cols: Seq[Column], separator: String = "#"): Column =
    Transforms.compositeKey(cols, separator)

  /** Binary rendered as the CQL `0x…` lowercase-hex literal (empty binary
    * renders as the empty-blob literal `0x`).
    */
  def blobToHex(c: Column): Column = Transforms.blobToHex(c)

  /** Row rendered as a JSON document (INSERT JSON shape). */
  def rowToJson(cols: Column*): Column = Transforms.rowToJson(cols: _*)

  /** Whitespace tokens. */
  def tokens(text: Column): Column = TextDedup.tokens(text)

  /** Distinct word n-gram shingles. */
  def shingles(text: Column, n: Int): Column = TextDedup.shingles(text, n)

  /** Heuristic [0,1] document quality score. */
  def qualityScore(text: Column): Column = TextAnalysis.qualityScore(text)

  /** Normalized-document md5 fingerprint. */
  def docFingerprint(text: Column): Column = TextAnalysis.fingerprint(text)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = TextDedup.hamming(a, b)

  /** Cosine similarity of two float-vector columns (native codegen'd
    * expression).
    */
  def vecCosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.floatVecCosine(a, b)

  /** DEFLATE-compress a binary column (codegen'd StaticInvoke, no UDF). */
  def deflateCol(bin: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.deflate(bin)

  /** Inverse of [[deflateCol]]. */
  def inflateCol(bin: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.inflate(bin)

  /** Aggregate: MinHash signature (array<long>, `numPerm` permutation
    * minima) over a group's 64-bit shingle hashes.
    */
  def minhashSig(h: Column, numPerm: Int): Column =
    org.apache.spark.sql.graft.MinHashAggFunctions.minhashSig(h, numPerm)

  /** Aggregate: LSH band keys (array<long>, one xxhash64 per band) over a
    * group's 64-bit shingle hashes.
    */
  def minhashBandKeys(h: Column, numPerm: Int, bands: Int): Column =
    org.apache.spark.sql.graft.MinHashAggFunctions.minhashBandKeys(h, numPerm, bands)

  /** Aggregate: 64-bit SimHash fingerprint over a group's 64-bit token
    * hashes.
    */
  def simhashFp(h: Column): Column =
    org.apache.spark.sql.graft.SimHashAggFunctions.simhashFp(h)

  /** 64-bit signed-random-projection signature of a float vector
    * (cosine-LSH bucketing key).
    */
  def srpSign(vec: Column): Column =
    org.apache.spark.sql.graft.SrpFunctions.srpSign(vec)

  /** Engine-portable UNIFORM 16-bit content-hash bucket (deterministic
    * sampling / splits).
    */
  def hashBucket(key: Column): Column =
    graft.operators.Sampling.hashBucket(key)
}
