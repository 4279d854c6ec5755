package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation. Random sampling
  * (`df.sample`) is not reproducible across runs/partitionings, which
  * breaks both the oracle discipline and dataset lineage at 100 TB —
  * every operator here derives its selection from a content hash, so the
  * same row set is chosen on any cluster at any parallelism.
  */
object Sampling {

  /** Portable UNIFORM 16-bit bucket in [0, 65536): the first 4 hex chars
    * of the key's md5 parsed as an integer — any engine with md5 and a
    * hex-string cast reproduces it (DuckDB: `('0x' || substr(md5(k), 1,
    * 4))::INTEGER`). Uniformity matters for threshold filters; a
    * byte-ascii construction (as in [[Cdc.tileMd5]], which only needs
    * modulo-uniformity) is NOT uniform over [0, 65536).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int")

  /** Keep rows whose key hashes below `rate` (0..1): a deterministic
    * Bernoulli sample. Pure filter — pushes down, no shuffle.
    */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit((rate * 65536).toInt))

  /** Deterministic importance sampling: each row kept with probability
    * `weightNum/weightDen` (a per-row integer-valued weight expression in
    * [0, weightDen]) — the quality-weighted downsampling step that keeps
    * high-value documents at a higher rate than boilerplate. The keep
    * test cross-multiplies into pure integer space —
    * `hashBucket·weightDen < weight·65536` — so no float ever rounds and
    * every engine/partitioning selects the identical row set. Pure
    * filter: pushes down to the scan when the weight is scan-computable.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightNum: Column,
                     weightDen: Long): DataFrame = {
    require(weightDen > 0, "weightDen must be > 0")
    df.filter(hashBucket(col(keyCol)).cast("long") * weightDen <
      weightNum.cast("long") * 65536L)
  }

  /** Deterministic dataset split: each row labeled by which cumulative
    * hash-bucket range its key falls in — the train/val/test assignment
    * every run, every engine, and every partitioning agrees on. Weights
    * are proportions; splits are exhaustive and disjoint by construction
    * (half-open bucket ranges). Pure projection — no shuffle; filtering
    * one split pushes down like [[hashSample]].
    */
  def hashSplit(df: DataFrame, keyCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be > 0")
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => math.min(65536, math.round(f * 65536).toInt))
    val b = hashBucket(col(keyCol))
    val label = splits.zipWithIndex.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), i)) =>
        when(b >= bounds(i) && b < bounds(i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Temperature-flattened corpus resampling: keep
    * `min(c_g, ceil(scale * c_g^(1/temperature)))` rows per group, chosen
    * by deterministic hash order — the multilingual-sampling recipe that
    * up-weights small groups relative to their raw share. `temperature`
    * = 2 is the common sqrt-flattening; it is also the only exponent
    * whose targets are bit-reproducible across engines (IEEE requires
    * `sqrt` correctly rounded; `pow` is not), so the oracle pins T = 2
    * and other temperatures are spec-verified.
    *
    * Two scans of the input (a column-pruned group count, then the
    * selection) joined by a broadcast of the tiny per-group target
    * table; the rank window is partitioned by group, so per-task work is
    * bounded by the largest group — same scale shape as
    * [[stratifiedSample]].
    */
  def temperatureResample(df: DataFrame, groupCol: String, keyCol: String,
                          scale: Double, temperature: Double = 2.0): DataFrame = {
    require(scale > 0 && temperature >= 1.0, "scale > 0, temperature >= 1")
    val flat = if (temperature == 2.0) sqrt(col("count"))
               else pow(col("count"), 1.0 / temperature)
    val targets = df.groupBy(col(groupCol)).count()
      .select(col(groupCol),
        least(col("count"), ceil(lit(scale) * flat).cast("long")).as("_target"))
    df.join(broadcast(targets), groupCol)
      .withColumn("_rs_rn", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(hashBucket(col(keyCol)), col(keyCol))))
      .filter(col("_rs_rn") <= col("_target"))
      .drop("_rs_rn", "_target")
  }

  /** Exactly `perStratum` rows per stratum, chosen by hash order (ties by
    * key) — deterministic stratified sampling. One shuffle on the stratum
    * column; at scale the window's per-stratum sort is bounded by stratum
    * size, and heavily skewed strata should pre-filter with [[hashSample]]
    * first.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       perStratum: Int): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(hashBucket(col(keyCol)), col(keyCol))))
      .filter(col("_rn") <= perStratum)
      .drop("_rn")

  /** Per-source quota cap: at most `cap` docs per source, highest
    * `scoreCol` first (key asc tie-break), with the kept rank — the
    * domain-cap stage of a web-corpus curation pipeline (no single
    * domain/source may dominate the training mix; the keep choice is
    * quality-ranked, not arbitrary). Ranking runs through the
    * bounded-heap TopKPerGroup physical operator: ≤ cap rows per source
    * per partition cross the shuffle, never a per-source full sort — at
    * 100 TB a mega-domain's millions of pages reduce to cap rows in the
    * partial stage.
    */
  def sourceCap(df: DataFrame, sourceCol: String, keyCol: String,
                scoreCol: String, cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    org.apache.spark.sql.graft.TopKPerGroup(df, Seq(col(sourceCol)),
        Seq(col(scoreCol).desc, col(keyCol)), cap)
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Token-budget-constrained corpus selection: per source, take documents
    * greedily by (score desc, id asc) while the running token total stays
    * within `budget` — the "best B tokens per source" knapsack heuristic a
    * pretraining mix is actually built with.
    *
    * The greedy prefix is computed WITHOUT sorting the corpus: documents
    * first collapse to a (source, score) histogram (n_docs, group tokens);
    * the cumulative window runs over THAT relation — bounded by distinct
    * scores per source, thousands of rows where the corpus has billions —
    * picking each source's cutoff score and the token room left there.
    * Score groups strictly inside the budget join back semi-style (no
    * per-doc window at all); only the single boundary group per source
    * pays a per-doc cumulative window, and that group alone is orders of
    * magnitude smaller than the corpus. Output = the selected documents
    * (equal to the naive sorted-prefix definition, which the oracle
    * computes directly).
    */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, sourceCol: String,
                        tokensCol: String, scoreCol: String,
                        budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val d = docs.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
      col(tokensCol).cast("long").as("n_tokens"),
      col(scoreCol).cast("long").as("score"))
    val grp = d.groupBy("source", "score")
      .agg(sum(col("n_tokens")).as("g_tokens"))
    val wg = Window.partitionBy("source").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val g2 = grp.withColumn("cum", sum(col("g_tokens")).over(wg))
    val full = g2.filter(col("cum") <= budget).select("source", "score")
    val boundary = g2
      .filter(col("cum") > budget && col("cum") - col("g_tokens") <= budget)
      .select(col("source"), col("score"),
        (lit(budget) - (col("cum") - col("g_tokens"))).as("room"))
    val wd = Window.partitionBy("source", "score").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundaryDocs = d.join(boundary, Seq("source", "score"))
      .withColumn("cumd", sum(col("n_tokens")).over(wd))
      .filter(col("cumd") <= col("room"))
      .select("source", "doc_id", "n_tokens", "score")
    d.join(full, Seq("source", "score"), "left_semi")
      .select("source", "doc_id", "n_tokens", "score")
      .unionByName(boundaryDocs)
  }

  /** Data-mixture epoch planning: given per-source token totals and a
    * target training budget, how many EPOCHS (repeat factor) of each
    * source a temperature-τ=0.5 mix implies — weight ∝ √tokens, so small
    * sources up-sample and mega-sources down-sample (the published
    * data-card calculation for multilingual/multi-source pretraining
    * mixes). One corpus aggregate; everything after is a sources-sized
    * relation with a broadcast 1-row total.
    */
  def mixtureEpochs(docs: DataFrame, sourceCol: String, tokensCol: String,
                    targetTotal: Long): DataFrame = {
    val perSource = docs.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokensCol)).cast("long").as("n_tokens"))
      .withColumn("w", sqrt(col("n_tokens").cast("double")))
    val total = perSource.agg(
      sum(col("w").cast("decimal(38,12)")).cast("double").as("sw"))
    perSource.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"),
        round(col("w") / col("sw"), 6).as("weight"),
        round(lit(targetTotal.toDouble) * (col("w") / col("sw")) /
          col("n_tokens").cast("double"), 6).as("epochs"))
  }
}
