package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for LLM-training-data pipelines: exact dedup,
  * exhaustive n-gram-Jaccard pairs, MinHash+LSH candidate generation with
  * exact verification, and SimHash fingerprints.
  *
  * Everything is declarative: shingling/minhashing are codegen'd
  * higher-order array expressions evaluated in one scan; candidate
  * generation is an equi-join on (band, bandHash) so Catalyst shuffles on
  * the bucket key. At 100 TB the LSH path is the one that survives —
  * exhaustive pair enumeration exists as the correctness oracle and for
  * small corpora.
  */
object TextDedup {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles as an array column. Documents shorter
    * than n words produce an empty set (mirrors the oracle's lateral range
    * producing no rows).
    */
  def shingles(text: Column, n: Int): Column = {
    val ws = split(text, " ")
    val grams = transform(
      sequence(lit(1), size(ws) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*))
    array_distinct(
      when(size(ws) >= n, grams).otherwise(array().cast("array<string>")))
  }

  /** Exact dedup groups: one row per distinct payload with the surviving
    * (minimum) id and the duplicate count. Plain hash groupBy — map-side
    * partial aggregation makes this a single shuffle of distinct texts.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exploded (doc_id, shingle) relation with per-doc set sizes. */
  private def shingleTable(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(shingles(col(textCol), n)).as("s"))

  /** Exhaustive pairs with n-gram-set Jaccard >= threshold. Candidate pairs
    * come from a self-join on shared shingles (never O(n^2) when shingle
    * document frequencies are bounded); the Jaccard is exact integer
    * arithmetic divided once in double, so it is bit-identical across
    * engines.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    withJaccard(inter, sizes, threshold)
  }

  private def withJaccard(interPairs: DataFrame, sizes: DataFrame,
                          threshold: Double): DataFrame =
    interPairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))

  // ------------------------------------------------------------- MinHash

  /** MinHash signatures as (doc_id, sig array<long>[numPerm]). Shingles are
    * exploded and hashed ONCE with xxhash64; permutation i is the cheap
    * re-mix xxhash64(h, i) folded by a min-aggregate (128 longs of state
    * per doc, map-side partial agg, one shuffle on doc_id). This shape
    * matters: a nested higher-order expression would re-evaluate the
    * string hashing once per permutation — 128x the work.
    */
  def minhashSignatures(docsWithShingles: DataFrame, numPerm: Int): DataFrame = {
    val hashed = docsWithShingles
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val minCols = (0 until numPerm).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i"))
    hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"),
        array((0 until numPerm).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH band keys: array of (band, bandHash) structs; equal band rows in
    * two signatures collide on the same key.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("bh"))
    }: _*)

  /** MinHash+LSH near-dup pairs, exact-verified: banding proposes candidate
    * pairs (equi-join on the band bucket), then the exact shingle-set
    * Jaccard is recomputed per candidate with `array_intersect` — so the
    * output equals the exhaustive [[jaccardPairs]] whenever the LSH
    * parameters give full recall at the threshold.
    *
    * Scale shape: one scan computes signatures; candidates shuffle on
    * (band, bandHash); verification joins candidates back to the shingle
    * arrays by doc id. No O(n^2) stage.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, numPerm: Int, bands: Int,
                      threshold: Double): DataFrame = {
    val rowsPerBand = numPerm / bands
    val withSets = docs.select(col(idCol).as("doc_id"),
        shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = minhashSignatures(withSets, numPerm)
      .select(col("doc_id"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("k"))
      .select(col("doc_id"), col("k.band").as("band"), col("k.bh").as("bh"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = withSets
    candidates
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  // ------------------------------------------------------------- SimHash

  /** 64-bit SimHash fingerprints: per-token xxhash64, term-frequency
    * weighted bit votes, sign of each vote becomes the bit. One groupBy
    * over (doc, token) then one wide aggregation — two shuffles, both on
    * doc_id, independent of corpus width.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$j")
    }
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 64).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), fp.as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
