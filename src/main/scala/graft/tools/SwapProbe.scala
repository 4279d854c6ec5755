package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Queries, SparkEntry, Tables}

/** Dev probe: the maintained-index upsert trio at scale with the publish
  * cost DECOMPOSED — standing-base ensure (cold once per corpus, then
  * adopted from disk in ~1 s), delta compute (the parts forms), swap
  * publish per table, version read-back, and the full warm entry for
  * cross-checking. Run against target/sf100 to price the delta-cost
  * publish.
  *
  * The phase bodies are the ENTRIES' OWN apply functions
  * (Queries.ivfUpsertApply / knnUpsertApply / dedupUpsertApply) driven
  * with a wall-clock PhaseTimer — one code path, so the probe can never
  * drift from what the entries ship.
  */
object SwapProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf100")
    val out = sys.env.getOrElse("SWAP_PROBE_OUT", "/tmp/swap_probe.json")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd"))
      // own warehouse NEXT TO the replica: the probe's corpus-sized
      // standing tables must not pollute the repo warehouse the bench
      // and verify mains run against (adoption makes them durable here)
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("SWAP_PROBE_WAREHOUSE", "target/sf100_wh"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      results += label -> math.rint(sec * 100) / 100
      println(f"[swap-probe] $label: $sec%.2f s")
      r
    }
    def phases(prefix: String): Queries.PhaseTimer = new Queries.PhaseTimer {
      def apply[A](label: String)(f: => A): A = timed(s"${prefix}_$label")(f)
    }
    def read(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      timed(label)(df.count()); ()
    }

    // ---------- IVF + kNN edges (shared diff corpora) ----------
    val (prev, curr, cents) = Queries.upsertEmbCorpora(s, d)
    val ivfBase = timed("ivf_ensure_base") {
      Queries.ensureIvfUpsertBase(s, d, prev, cents)
    }
    val edgeBase = timed("knn_ensure_base") {
      Queries.ensureKnnUpsertBase(s, d, prev, cents)
    }

    timed("ivf_warm_entry_total") {
      SparkEntry.queries("ann_ivf_index_upsert")(s, d).count()
    }
    read("ivf_v2_read")(
      Queries.ivfUpsertApply(s, ivfBase, prev, curr, cents, phases("ivf")))

    timed("knn_warm_entry_total") {
      SparkEntry.queries("knn_graph_index_upsert")(s, d).count()
    }
    read("knn_v2_read")(
      Queries.knnUpsertApply(s, ivfBase, edgeBase, prev, curr, cents,
        phases("knn")))

    // ---------- dedup pairs/bands/membership ----------
    val docs = Tables.documents(s, d)
    val sMod = Queries.upsertDiffModulus(docs.count())
    val dPrev = docs.filter(col("doc_id") % sMod =!= 3)
      .withColumn("text", when(col("doc_id") % sMod === 2,
        concat_ws(" ", reverse(split(col("text"), " "))))
        .otherwise(col("text")))
    val dCurr = docs.filter(col("doc_id") % sMod =!= 7)
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_")
    val pairsTbl = s"dedup_upsert_pairs_$sfx"
    val lshTbl = s"dedup_upsert_lsh_$sfx"
    val clusTbl = s"dedup_upsert_clusters_$sfx"
    val nParts = Queries.dedupUpsertParts(docs.count())
    println(s"[swap-probe] dedup partition count: $nParts")
    timed("dedup_ensure_base") {
      Queries.ensureUpsertBaseIndex(s, d, dPrev, pairsTbl, lshTbl, clusTbl,
        nParts)
    }
    timed("dedup_warm_entry_total") {
      SparkEntry.queries("dedup_cluster_index_upsert")(s, d).count()
    }
    read("dedup_v2_read")(
      Queries.dedupUpsertApply(s, pairsTbl, lshTbl, clusTbl, dPrev, dCurr,
        nParts, phases("dedup")))

    val json = results.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\"sf_dir\": \"" + d + "\", ", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[swap-probe] wrote $out")
    println(json)
  }
}
