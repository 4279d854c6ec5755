package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{Queries, SparkEntry, Tables}
import graft.operators.{Ann, Clustering, TextDedup}
import graft.sources.ParquetSink

/** Dev probe: the maintained-index upsert trio at scale with the publish
  * cost DECOMPOSED — standing-base ensure (cold, once per corpus), delta
  * compute (the parts forms), swap publish (delta write + partition DDL),
  * version read-back, and the full warm entry for cross-checking. Run
  * against target/sf100 to price the delta-cost publish against the
  * r11-era O(corpus) publishes (warm IVF 22 s / LSH 90 s / kNN edges
  * 108 s, all dominated by the full-table rewrite).
  *
  * Phase bodies mirror the Queries entries exactly (same private[graft]
  * helpers, same table names), so the numbers price the entry's real
  * code paths.
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      results += label -> math.rint(sec * 100) / 100
      println(f"[swap-probe] $label: $sec%.2f s")
      r
    }

    // ---------- IVF + kNN edges (shared diff corpora) ----------
    val (prev, curr, cents) = Queries.upsertEmbCorpora(s, d)
    val ivfBase = t("ivf_ensure_base") {
      Queries.ensureIvfUpsertBase(s, d, prev, cents)
    }
    val edgeBase = t("knn_ensure_base") {
      Queries.ensureKnnUpsertBase(s, d, prev, cents)
    }

    t("ivf_warm_entry_total") {
      SparkEntry.queries("ann_ivf_index_upsert")(s, d).count()
    }
    val (ivfAff, ivfRows) = t("ivf_parts_compute") {
      val (aff, rows) = Ann.ivfIndexUpsertParts(s.table(ivfBase), prev, curr,
        cents, "vec_id", "embedding", "vec_id", "embedding")
      (aff.collect().map(_.getLong(0).toString).toSet, rows)
    }
    println(s"[swap-probe] ivf affected partitions: ${ivfAff.size}")
    t("ivf_publish_swap") {
      ParquetSink.publishPartitionSwap(s, ivfBase, ivfBase + "_v2",
        "centroid_id", ivfAff, ivfRows, sortCols = Seq("vec_id"))
    }
    t("ivf_v2_read") { s.table(ivfBase + "_v2").count() }

    t("knn_warm_entry_total") {
      SparkEntry.queries("knn_graph_index_upsert")(s, d).count()
    }
    val currIdx = Ann.ivfIndexUpsert(s.table(ivfBase), prev, curr, cents,
      "vec_id", "embedding", "vec_id", "embedding")
    val (knnAff, knnRows) = t("knn_parts_compute") {
      val (aff, rows) = Ann.knnEdgeIndexUpsertParts(s.table(edgeBase),
        currIdx, prev, curr, cents, "vec_id", "embedding", "vec_id",
        "embedding", k = 3)
      (aff.collect().map(_.getLong(0).toString).toSet, rows)
    }
    println(s"[swap-probe] knn affected partitions: ${knnAff.size}")
    t("knn_publish_swap") {
      ParquetSink.publishPartitionSwap(s, edgeBase, edgeBase + "_v2",
        "centroid_id", knnAff, knnRows, sortCols = Seq("query_id", "rank"))
    }
    t("knn_v2_read") { s.table(edgeBase + "_v2").count() }

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
    t("dedup_ensure_base") {
      Queries.ensureUpsertBaseIndex(s, d, dPrev, pairsTbl, lshTbl, clusTbl,
        nParts)
    }
    t("dedup_warm_entry_total") {
      SparkEntry.queries("dedup_cluster_index_upsert")(s, d).count()
    }
    // decomposition mirrors the entry body
    val diff = dPrev.select(col("doc_id"), xxhash64(col("text")).as("ph"))
      .join(dCurr.select(col("doc_id"), xxhash64(col("text")).as("ch")),
        Seq("doc_id"), "full_outer")
    val (stale, bandedChanged, added) = t("dedup_parts_compute") {
      val touched = diff.filter(!(col("ph") <=> col("ch")))
        .select("doc_id", "ph", "ch").localCheckpoint(true)
      val changed = touched.filter(col("ch").isNotNull).select("doc_id")
      val removed = touched.filter(col("ph").isNotNull && col("ch").isNull)
        .select("doc_id")
      TextDedup.upsertLshPairsParts(
        s.table(pairsTbl).drop("pa_part"), s.table(lshTbl).drop("dk_part"),
        dCurr, changed, removed,
        "doc_id", "text", n = 3, numPerm = 128, bands = 32, threshold = 0.8)
    }
    val p = lit(nParts)
    t("dedup_publish_pairs") {
      val pairsBase = s.table(pairsTbl)
      val staleA = stale.select(col("doc_id").as("doc_a"))
      val staleB = stale.select(col("doc_id").as("doc_b"))
      val affPairParts = pairsBase
        .join(broadcast(staleA), Seq("doc_a"), "left_semi").select("pa_part")
        .unionByName(pairsBase.join(broadcast(staleB), Seq("doc_b"),
          "left_semi").select("pa_part"))
        .unionByName(added.select(pmod(col("doc_a"), p).as("pa_part")))
        .distinct().collect().map(_.getLong(0)).toSet
      val pairsDelta = pairsBase
        .filter(col("pa_part").isInCollection(affPairParts))
        .join(broadcast(staleA), Seq("doc_a"), "left_anti")
        .join(broadcast(staleB), Seq("doc_b"), "left_anti")
        .unionByName(added.withColumn("pa_part", pmod(col("doc_a"), p)))
      ParquetSink.publishPartitionSwap(s, pairsTbl, pairsTbl + "_v2",
        "pa_part", affPairParts.map(_.toString), pairsDelta,
        sortCols = Seq("doc_a", "doc_b"))
    }
    t("dedup_publish_bands") {
      val affBandParts = stale.select(pmod(col("doc_id"), p).as("dk_part"))
        .distinct().collect().map(_.getLong(0)).toSet
      val bandedDelta = s.table(lshTbl)
        .filter(col("dk_part").isInCollection(affBandParts))
        .join(broadcast(stale), Seq("doc_id"), "left_anti")
        .unionByName(bandedChanged.withColumn("dk_part",
          pmod(col("doc_id"), p)))
      ParquetSink.publishPartitionSwap(s, lshTbl, lshTbl + "_v2", "dk_part",
        affBandParts.map(_.toString), bandedDelta,
        sortCols = Seq("doc_id", "band"))
    }
    t("dedup_publish_clusters") {
      val touched = diff.filter(!(col("ph") <=> col("ch")))
        .select("doc_id", "ph", "ch").localCheckpoint(true)
      val changed = touched.filter(col("ch").isNotNull).select("doc_id")
      val removed = touched.filter(col("ph").isNotNull && col("ch").isNull)
        .select("doc_id")
      val seeds = changed.unionByName(removed)
        .unionByName(added.select(col("doc_a").as("doc_id")))
        .unionByName(added.select(col("doc_b").as("doc_id")))
      val (affDocs, reclosed) = Clustering.upsertClustersParts(
        s.table(clusTbl).drop("dc_part"),
        s.table(pairsTbl + "_v2").drop("pa_part"), seeds)
      val affClusParts = affDocs.select(pmod(col("doc_id"), p).as("dc_part"))
        .distinct().collect().map(_.getLong(0)).toSet
      val clusDelta = s.table(clusTbl)
        .filter(col("dc_part").isInCollection(affClusParts))
        .join(broadcast(affDocs), Seq("doc_id"), "left_anti")
        .unionByName(reclosed.withColumn("dc_part", pmod(col("doc_id"), p)))
      ParquetSink.publishPartitionSwap(s, clusTbl, clusTbl + "_v2",
        "dc_part", affClusParts.map(_.toString), clusDelta,
        sortCols = Seq("doc_id"))
    }
    t("dedup_v2_read") { s.table(clusTbl + "_v2").count() }

    val json = results.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\"sf_dir\": \"" + d + "\", ", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"[swap-probe] wrote $out")
    println(json)
  }
}
