package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data assembly: lay documents out along a
  * deterministic global order and cut the concatenated token stream into
  * fixed-capacity training sequences (the concatenate-and-chunk packing of
  * GPT-style pretraining — documents may span a sequence boundary; the
  * assignment records where each document starts and how many sequences
  * it touches).
  *
  * The global order is (hash bucket, id): hash-major order IS the
  * document shuffle a training run wants, and it is what makes the global
  * prefix sum distributable — per-bucket cumulative sums are window
  * functions over bucket partitions, and the cross-bucket offsets are an
  * exclusive prefix over per-bucket totals: `buckets` values, metadata
  * scale, computed once on the driver (same footprint class as AQE stage
  * statistics — NOT a data collect). Every value derives from md5 hashes
  * and exact integer arithmetic, so any engine reproduces the identical
  * packing at any parallelism.
  */
object Packing {

  /** Assigns each row a starting sequence id/offset and span count for
    * packing `tokensCol` into sequences of `capacity` tokens.
    * Output: (id, tokens, seq_id, seq_offset, n_spans); a zero-token row
    * occupies no space but is pinned to its boundary position with
    * n_spans = 1. Sums stay exact through the double division while total
    * tokens < 2^53 (~9e15 — far beyond a 100 TB corpus's ~2.5e13).
    */
  def packSequences(docs: DataFrame, idCol: String, tokensCol: String,
                    capacity: Long, buckets: Int = 64): DataFrame = {
    require(capacity > 0 && buckets > 0, "capacity and buckets must be > 0")
    val id = col(idCol)
    val b = pmod(Sampling.hashBucket(id), lit(buckets))
    val inBucket = docs.select(id.as("id"),
        col(tokensCol).cast("long").as("tokens"), b.as("_b"))
      .withColumn("_cum_in",
        sum(col("tokens")).over(Window.partitionBy("_b").orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // exclusive prefix over the per-bucket totals: `buckets` longs
    val totals = inBucket.groupBy("_b").agg(sum("tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until buckets)
      .scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    val offsetOf = element_at(
      typedLit(offsets.indices.dropRight(1).map(i => i -> offsets(i)).toMap),
      col("_b"))
    val cap = lit(capacity)
    inBucket
      .withColumn("_cum_before", offsetOf + col("_cum_in") - col("tokens"))
      .withColumn("seq_id",
        floor(col("_cum_before") / cap).cast("long"))
      .withColumn("seq_offset", pmod(col("_cum_before"), cap))
      .withColumn("n_spans",
        floor((col("_cum_before") + greatest(col("tokens"), lit(1L)) - 1) / cap)
          .cast("long") - col("seq_id") + 1)
      .select(col("id").as(idCol), col("tokens"), col("seq_id"),
        col("seq_offset"), col("n_spans"))
  }

  /** The packing-efficiency report over a [[packSequences]] relation: doc
    * and token totals, sequence count, overall utilization (exact integer
    * ppm — only the final sequence can be part-empty under
    * concatenate-and-chunk) and how many documents straddle a sequence
    * boundary (the cross-attention contamination a span-aware loader
    * masks). One aggregate, metadata-scale output.
    */
  def packStats(packed: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be > 0")
    packed.agg(
        count(lit(1)).as("n_docs"),
        sum("tokens").as("total_tokens"),
        sum(when(col("n_spans") > 1, 1L).otherwise(0L)).as("n_split_docs"))
      .select(col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${capacity - 1}) div $capacity").as("n_seqs"),
        expr(s"total_tokens * 1000000 div (((total_tokens + ${capacity - 1}) div $capacity) * $capacity)")
          .as("util_ppm"),
        col("n_split_docs"))
  }

  /** Sliding-window document chunking: cut each document into windows of
    * `size` characters advancing by `stride` (overlap = size - stride) —
    * the segmentation step of RAG indexing and long-document training.
    * Every document yields at least one chunk; the last chunk starts at
    * the final stride boundary that still exposes new text, so short
    * tails are covered without emitting an empty window.
    *
    * Pure per-row generate (explode of a per-doc integer sequence): no
    * shuffle, parallelism is the scan's, and output size is bounded by
    * len/stride chunks per document. Chunk count derives from
    * `length(text)` with exact integer arithmetic, so the chunking is
    * identical on any engine/partitioning.
    */
  def chunkDocuments(docs: DataFrame, textCol: String, size: Int,
                     stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val lastIdx = greatest(
      ceil((length(col(textCol)) - size).cast("double") / stride), lit(0))
      .cast("int")
    docs
      .withColumn("chunk_idx", explode(sequence(lit(0), lastIdx)))
      .withColumn("chunk_start", (col("chunk_idx") * stride).cast("long"))
      .withColumn("chunk_text",
        col(textCol).substr(col("chunk_idx") * stride + 1, lit(size)))
  }

  /** Deterministic span-corruption masks (the T5 denoising objective,
    * Raffel et al. '20 §3.1.4): per document, mask ~`noiseNum/noiseDen`
    * of the whitespace tokens in spans of mean length `meanSpan`. The
    * reference recipe samples span starts from an RNG; this re-expression
    * derives them from a content hash so the same masks come out on any
    * engine, partitioning, or rerun (dataset lineage at 100 TB — the
    * same discipline as [[graft.operators.Sampling]]).
    *
    * Construction: n_spans = max(1, (n·noise) div meanSpan·den); the doc
    * partitions into n_spans equal token gaps, each gap holds exactly one
    * masked span of hash-picked length (meanSpan ± 1, capped at the gap)
    * at a hash-jittered offset — so spans never overlap or cross gaps by
    * construction, and the masked fraction tracks the noise density.
    * Output: one row per span (doc_id, span_id, start_tok, len_tok), the
    * relation a seq2seq assembler joins to cut inputs/targets. Pure
    * per-row explode + projection, no shuffle; md5-derived jitter and
    * integer arithmetic end-to-end.
    */
  def spanCorruptionMasks(docs: DataFrame, idCol: String, textCol: String,
                          noiseNum: Int = 15, noiseDen: Int = 100,
                          meanSpan: Int = 3): DataFrame = {
    require(noiseNum > 0 && noiseDen >= noiseNum && meanSpan >= 1,
      "need 0 < noiseNum <= noiseDen and meanSpan >= 1")
    docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("n_masked", expr(s"n_tokens * $noiseNum div $noiseDen"))
      .filter(col("n_masked") >= 1)
      .withColumn("n_spans", greatest(lit(1L), expr(s"n_masked div $meanSpan")))
      .withColumn("gap", expr("n_tokens div n_spans"))
      .select(col("doc_id"), col("gap"),
        explode(expr("sequence(0L, n_spans - 1)")).as("span_id"))
      .withColumn("h",
        conv(substring(md5(concat_ws(":", col("doc_id"), col("span_id"))),
          1, 4), 16, 10).cast("long"))
      .withColumn("len_tok",
        least(col("gap"), lit(meanSpan.toLong) - 1 + col("h") % 3))
      .withColumn("start_tok",
        col("span_id") * col("gap") +
          col("h") % greatest(lit(1L), col("gap") - col("len_tok") + 1))
      .select(col("doc_id"), col("span_id"), col("start_tok"), col("len_tok"))
  }

  /** Deterministic source-proportional interleaving: a global training
    * order in which every source's documents appear spread evenly across
    * the whole schedule (document r of c from a source lands near
    * fraction (2r-1)/(2c) of the run) — the data-mixing schedule that
    * avoids source-blocked training (all of source A, then all of B)
    * without an RNG shuffle. Within-source order is hash order (the
    * document shuffle), so the schedule is reproducible anywhere.
    *
    * The interleave key is exact integer arithmetic: the fraction scales
    * by 2^40 through a DECIMAL(38,0) intermediate (no float rounds, no
    * overflow for any corpus below ~5·10^11 docs/source), then packs the
    * source index into the low bits to make keys unique. The global
    * position is [[GlobalIds.assign]] over that key — the bucket-histogram
    * prefix-sum scheme, never a single-partition window. One shuffle for
    * the per-source rank window, one for the id assignment; the
    * per-source count/index relation is tiny and broadcast.
    */
  def corpusInterleave(docs: DataFrame, idCol: String,
                       sourceCol: String): DataFrame = {
    val srcs = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("_src_n"))
      .withColumn("_src_idx", row_number().over(
        Window.orderBy(col(sourceCol))).cast("long") - 1)
    val ranked = docs.select(col(idCol).as("doc_id"), col(sourceCol))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col(sourceCol))
          .orderBy(Sampling.hashBucket(col("doc_id")), col("doc_id")))
        .cast("long"))
    val keyed = ranked.join(broadcast(srcs), Seq(sourceCol))
      .withColumn("_frac",
        expr("(cast(2 * _r - 1 as decimal(38,0)) * 1099511627776) div (2 * _src_n)"))
      .withColumn("_ikey", col("_frac") * 4096L + col("_src_idx"))
    GlobalIds.assign(keyed, "_ikey", idName = "train_pos")
      .select(col("doc_id"), col(sourceCol).as("source"),
        col("_r").as("src_rank"), col("train_pos"))
  }

  /** Small-file compaction planning — the Iceberg/Delta `rewriteDataFiles`
    * bin-pack shape: within each table partition, lay files out in id
    * order and cut the cumulative byte stream into `targetBytes` bins;
    * each bin is one rewrite task. Output is the per-bin plan (file
    * count, byte total, id range) a compactor executes and a table owner
    * reviews (bins with many files = the small-file problem being fixed;
    * a single-file bin at target size = already compact, skip it).
    *
    * The prefix sum is a window PER PARTITION — the natural parallel unit
    * (a partition's file list is metadata-sized; Iceberg plans per
    * partition for the same reason); no corpus-sized relation passes
    * through one task unless the table itself is one giant partition.
    */
  def compactionPlan(files: DataFrame, partCol: String, idCol: String,
                     sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    files.select(col(partCol).as("part"), col(idCol).as("file_id"),
        col(sizeCol).cast("long").as("bytes"))
      .withColumn("_cum",
        sum(col("bytes")).over(Window.partitionBy("part").orderBy("file_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("bin", expr(s"(_cum - bytes) div $targetBytes"))
      .groupBy("part", "bin")
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).cast("long").as("total_bytes"),
        min(col("file_id")).as("first_file"),
        max(col("file_id")).as("last_file"))
  }
}
