package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — the step that turns
  * near-duplicate PAIRS (from LSH / embedding bucketing) into duplicate
  * CLUSTERS with one canonical survivor per cluster, which is what a
  * dedup pipeline actually acts on at 100 TB.
  *
  * Algorithm: iterated min-label propagation with pointer jumping
  * (label <- min over neighbours' labels and the label's own label),
  * O(log(diameter)) rounds. Every round is two shuffle joins + one
  * aggregate — all declarative, AQE-optimized; the driver only decides
  * WHEN to stop (a count per round), it never touches row data. Dedup
  * graphs are unions of small cliques, so convergence is 1-2 rounds in
  * practice; maxIter bounds adversarial chains.
  */
object Clustering {

  /** (node, component) for every node in `pairs`, component = min node id
    * reachable. `pairs` columns: (aCol, bCol), one row per undirected edge.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 16): DataFrame = {
    // Undirected edge list, both directions; self-loops are harmless.
    // Eager localCheckpoint TRUNCATES LINEAGE: the edge relation is tiny
    // relative to the corpus (only near-dup docs appear) while its
    // upstream plan (e.g. the whole LSH pipeline) is huge — without the
    // cut, every iteration's logical plan embeds the full upstream tree
    // and each round re-pays optimizer + codegen over it. Same pattern
    // per iteration: constant-size plans, constant-depth lineage (the
    // GraphX/ML iterative-algorithm discipline).
    val sc = pairs.sparkSession.sparkContext
    // Checkpoint with block tracking so superseded rounds' cached RDDs
    // free DETERMINISTICALLY (the ContextCleaner would eventually GC
    // them, but a long-lived driver clustering repeatedly shouldn't
    // accumulate block-manager entries until then). The returned labels'
    // blocks stay cached for the caller's consumption.
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val ck = df.localCheckpoint(true)
      (ck, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def unpersistIds(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
    // Checkpoint the PAIR relation before mirroring it: the union's two
    // branches would otherwise each evaluate the (expensive) pair
    // generation — the LSH pipeline runs twice for one edge list.
    val (p, pIds) = checkpointTracked(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst")))
    val (edges, edgeIds) = checkpointTracked(
      p.unionByName(p.select(col("dst").as("src"), col("src").as("dst"))))
    unpersistIds(pIds) // edges now hold the data; the un-mirrored copy can go
    var (labels, labelIds) = checkpointTracked(
      edges.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("mind"))
        .select(col("node"), least(col("node"), col("mind")).as("comp")))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbour propagation: candidate = min over neighbours' components
      val viaEdges = edges
        .join(labels.withColumnRenamed("node", "dst2"),
          col("dst") === col("dst2"))
        .groupBy(col("src").as("node"))
        .agg(min(col("comp")).as("ncomp"))
      // pointer jumping: candidate = component of my component
      val viaPointer = labels.as("l")
        .join(labels.as("p"), col("l.comp") === col("p.node"))
        .select(col("l.node").as("node"), col("p.comp").as("pcomp"))
      val (next, nextIds) = checkpointTracked(labels
        .join(viaEdges, Seq("node"), "left")
        .join(viaPointer, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")),
            coalesce(col("pcomp"), col("comp"))).as("comp")))
      // One driver-side count per round decides termination only (the
      // iterative-algorithm pattern, as in ML training loops); both
      // inputs are checkpointed, so it scans two tiny label sets.
      val changed = next.as("n")
        .join(labels.as("o"), Seq("node"))
        .filter(col("n.comp") =!= col("o.comp"))
        .limit(1).count()
      unpersistIds(labelIds) // superseded round's blocks
      labels = next
      labelIds = nextIds
      converged = changed == 0
      iter += 1
    }
    unpersistIds(edgeIds)
    labels.select(col("node").as("doc_id"), col("comp").as("cluster_id"))
  }

  /** Duplicate clusters from near-dup pairs: every clustered doc with its
    * cluster id (= min doc id in the cluster) and a keep flag on the
    * canonical survivor.
    */
  def dedupClusters(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .withColumn("keep", (col("doc_id") === col("cluster_id")).cast("boolean"))

  /** The corpus AFTER dedup: every document that is either outside any
    * near-dup cluster or its cluster's canonical (min-id) survivor. The
    * step that turns pair/cluster REPORTS into the training corpus itself.
    * The drop set holds only non-canonical cluster members — tiny relative
    * to the corpus — so the anti join broadcasts under AQE and the big
    * side streams through unshuffled.
    */
  def applyDedup(docs: DataFrame, pairs: DataFrame, idCol: String,
                 aCol: String, bCol: String): DataFrame = {
    val drop = dedupClusters(pairs, aCol, bCol)
      .filter(!col("keep")).select(col("doc_id").as("__drop_id"))
    docs.join(drop, col(idCol) === col("__drop_id"), "left_anti")
  }

  /** What dedup bought, per group: document and weight (e.g. char/token)
    * totals before and after dropping non-canonical cluster members — the
    * report a corpus owner reads after every dedup run. One broadcast
    * left join of the tiny drop set + one grouped aggregate; weights sum
    * as longs (exact).
    */
  def dedupSavings(docs: DataFrame, pairs: DataFrame, idCol: String,
                   aCol: String, bCol: String, groupCol: String,
                   weightCol: String): DataFrame = {
    val drop = dedupClusters(pairs, aCol, bCol)
      .filter(!col("keep")).select(col("doc_id").as("__drop_id"))
    docs.join(drop, col(idCol) === col("__drop_id"), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("docs_before"),
        count(when(col("__drop_id").isNull, 1)).as("docs_after"),
        sum(col(weightCol)).as("weight_before"),
        coalesce(sum(when(col("__drop_id").isNull, col(weightCol))), lit(0L))
          .as("weight_after"))
  }
}
