package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composed form of the individual
  * curation operators, in the order a training-data pipeline runs them —
  *
  *   1. exact dedup (md5 groups, keep the min doc id),
  *   2. heuristic quality gate ([[TextAnalysis.qualityScore]] ≥ min),
  *   3. intra-doc repetition gate (dup-token fraction ≤ max),
  *   4. near-dup clustering (MinHash+LSH pairs, exact-verified →
  *      connected components → keep cluster canonicals),
  *   5. per-language stratified sample (hash order, deterministic).
  *
  * Every stage is the already-oracle-checked operator; the composition
  * stays one declarative plan (no collect between stages), so Catalyst
  * sees the whole pipeline — filters merge, column pruning reaches the
  * scan, and the LSH stage only processes survivors of the cheap gates.
  * Deterministic end to end: same input ⇒ same curated set on any
  * partitioning.
  */
object CurationPipeline {

  /** Thresholds are the caller's policy; defaults match the inventory
    * queries' parameters.
    */
  final case class Config(
      qualityMin: Double = 0.5,
      dupRatioMax: Double = 0.3,
      shingleN: Int = 3,
      numPerm: Int = 128,
      bands: Int = 32,
      jaccardThreshold: Double = 0.8,
      perLangSample: Int = 20)

  /** The pipeline's intermediate relations, exposed so callers can count,
    * inspect, or branch any stage without re-deriving it.
    */
  final case class Stages(input: DataFrame, afterExact: DataFrame,
                          gated: DataFrame, deduped: DataFrame,
                          sampled: DataFrame)

  def stages(docs: DataFrame, idCol: String, textCol: String,
             langCol: String, cfg: Config = Config()): Stages = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text"), col(langCol).as("lang"))

    // 1. exact dedup: survivors are each hash-group's min id
    val exactKeep = TextDedup.exactGroups(base, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val afterExact = base.join(exactKeep, "doc_id")

    // 2.+3. cheap per-row gates before anything quadratic-ish
    val rep = TextAnalysis.repetitionProfile(afterExact, "doc_id", "text")
      .select(col("doc_id"), col("dup_ratio"))
    val gated = afterExact
      .filter(TextAnalysis.qualityScore(col("text")) >= cfg.qualityMin)
      .join(rep, "doc_id")
      .filter(col("dup_ratio") <= cfg.dupRatioMax)
      .select(col("doc_id"), col("text"), col("lang"))

    // 4. near-dup clustering over the survivors; drop non-canonicals
    val pairs = TextDedup.minhashLshPairs(gated, "doc_id", "text",
      cfg.shingleN, cfg.numPerm, cfg.bands, cfg.jaccardThreshold)
    val dropped = Clustering.dedupClusters(pairs, "doc_a", "doc_b")
      .filter(!col("keep")).select(col("doc_id"))
    val deduped = gated.join(dropped, Seq("doc_id"), "left_anti")

    // 5. deterministic stratified sample per language
    val sampled = Sampling.stratifiedSample(deduped, "lang", "doc_id",
        cfg.perLangSample)
      .select(col("doc_id"), col("lang"))
    Stages(base, afterExact, gated, deduped, sampled)
  }

  /** Curated (doc_id, lang) relation after all five stages. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             langCol: String, cfg: Config = Config()): DataFrame =
    stages(docs, idCol, textCol, langCol, cfg).sampled

  /** Per-stage survivor counts — the pipeline's replication-stats shape
    * (what the reference's Stats objects record per tile, keyspaces:
    * 759-785). One relation, ordered by stage.
    */
  def stageCounts(docs: DataFrame, idCol: String, textCol: String,
                  langCol: String, cfg: Config = Config()): DataFrame = {
    val st = stages(docs, idCol, textCol, langCol, cfg)
    def c(stage: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"))
        .select(lit(stage.toLong).as("stage"), lit(name).as("name"),
          col("n_docs"))
    c(0, "input", st.input)
      .unionByName(c(1, "exact_dedup", st.afterExact))
      .unionByName(c(2, "quality_gates", st.gated))
      .unionByName(c(3, "near_dedup", st.deduped))
      .unionByName(c(4, "stratified_sample", st.sampled))
  }
}
