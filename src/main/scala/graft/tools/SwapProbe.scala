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

    // ---------- chained maintenance steady state (round 14) ----------
    // Three consecutive deltas through the chained path: base → v2
    // (published above) → v3 → v4, each hop publishing FROM the prior
    // swap-published version. Then dropIndexVersion between chains and
    // a rerun, asserting warm cost AND the warehouse's version-dir
    // population stay flat (no leak of superseded delta dirs).
    val emb = Tables.embeddings(s, d)
    val eMod = Queries.upsertDiffModulus(emb.count())
    def snap(del: Int, rev: Int) = emb.filter(col("vec_id") % eMod =!= del)
      .withColumn("embedding",
        when(col("vec_id") % eMod === rev, reverse(col("embedding")))
          .otherwise(col("embedding")))
    val t2 = snap(5, 11)
    val t3 = snap(13, 17)
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"))
    val whFs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    def versionDirs(): Set[String] = whFs.listStatus(wh).iterator
      .map(_.getPath.getName)
      .filter(n => n.startsWith(ivfBase + "_v3") || n.startsWith(ivfBase + "_v4"))
      .toSet
    def runChain(tag: String): Unit = {
      timed(s"chain_hop2_$tag") {
        Queries.ivfUpsertApply(s, ivfBase + "_v2", curr, t2, cents,
          outTbl = Some(ivfBase + "_v3")).count()
      }
      timed(s"chain_hop3_$tag") {
        Queries.ivfUpsertApply(s, ivfBase + "_v3", t2, t3, cents,
          outTbl = Some(ivfBase + "_v4")).count()
      }
    }
    // start from a clean slate: REPUBLISHING a version name that has a
    // live dependent legitimately retains one superseded delta dir for
    // an extra cycle (v3's GC runs while the OLD v4 ledger still
    // references v3_delta_g1; dropIndexVersion reclaims it) — a probe
    // inheriting a prior run's v3/v4 would count that retention as a
    // leak. Dropping first makes run1/run2 like-for-like.
    graft.sources.ParquetSink.dropIndexVersion(s, ivfBase + "_v4")
    graft.sources.ParquetSink.dropIndexVersion(s, ivfBase + "_v3")
    runChain("run1")
    val dirs1 = versionDirs()
    timed("chain_drop_versions") {
      graft.sources.ParquetSink.dropIndexVersion(s, ivfBase + "_v4")
      graft.sources.ParquetSink.dropIndexVersion(s, ivfBase + "_v3")
    }
    runChain("run2")
    val dirs2 = versionDirs()
    println(s"[swap-probe] chain version dirs run1=${dirs1.size} run2=${dirs2.size}")
    require(dirs1 == dirs2,
      s"generation GC leaked dirs across chains: ${dirs1.diff(dirs2)} vs ${dirs2.diff(dirs1)}")
    // scale correctness cross-check: the 3-hop chained v4 must equal a
    // SINGLE delta application base→t3 (the 2-hop ≡ rebuild equality is
    // oracle-gated at small sf; this proves hop composition at sf100
    // without paying a full n^1.5 rebuild)
    timed("chain_v4_crosscheck") {
      val oneHop = graft.operators.Ann.ivfIndexUpsert(s.table(ivfBase),
        prev, t3, cents, "vec_id", "embedding", "vec_id", "embedding")
        .select("vec_id", "centroid_id")
      val v4 = s.table(ivfBase + "_v4").select("vec_id", "centroid_id")
      val mismatch = v4.exceptAll(oneHop).count() + oneHop.exceptAll(v4).count()
      require(mismatch == 0, s"chained v4 != one-hop apply: $mismatch rows differ")
    }

    val json = results.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\"sf_dir\": \"" + d + "\", ", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[swap-probe] wrote $out")
    println(json)
  }
}
