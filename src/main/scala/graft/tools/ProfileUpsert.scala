package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Clustering, TextDedup}

/** Dev aid: stage-by-stage wall clocks of the dedup_cluster_index_upsert
  * body (standing index prebuilt untimed), to locate where the benched
  * seconds actually go.
  */
object ProfileUpsert {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.io.compression.codec", sys.env.getOrElse("SPARK_GRAFT_CODEC", "zstd"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(s, d)
    val prev = docs.filter(col("doc_id") % 23 =!= 3)
      .withColumn("text", when(col("doc_id") % 17 === 2,
        concat_ws(" ", reverse(split(col("text"), " "))))
        .otherwise(col("text")))
    val curr = docs.filter(col("doc_id") % 19 =!= 7)
    // _prof suffix: never the entry's standing tables — writing those
    // without stamping their fingerprint would silently force the
    // entry's next ensure to rebuild
    val sfx = d.replaceAll("[^A-Za-z0-9]", "_") + "_prof"
    val pairsTbl = s"dedup_upsert_pairs_$sfx"
    val lshTbl = s"dedup_upsert_lsh_$sfx"
    val clusTbl = s"dedup_upsert_clusters_$sfx"
    t("ensure standing index") {
      graft.sources.ParquetSink.writeBucketedSnapshot(
        TextDedup.minhashLshPairs(prev, "doc_id", "text",
          n = 3, numPerm = 128, bands = 32, threshold = 0.8),
        pairsTbl, Seq("doc_a"), buckets = 16)
      graft.sources.ParquetSink.writeLshIndex(
        TextDedup.bandedKeys(
          TextDedup.shingleHashTable(prev, "doc_id", "text", 3),
          numPerm = 128, bands = 32), lshTbl, buckets = 16)
      graft.sources.ParquetSink.writeBucketedSnapshot(
        Clustering.dedupClusters(s.table(pairsTbl), "doc_a", "doc_b")
          .select("doc_id", "cluster_id"),
        clusTbl, Seq("doc_id"), buckets = 16)
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val diff = prev.select(col("doc_id"), col("text").as("pt"))
        .join(curr.select(col("doc_id"), col("text").as("ct")),
          Seq("doc_id"), "full_outer")
      val changed = diff.filter(col("ct").isNotNull &&
        (col("pt").isNull || !(col("pt") <=> col("ct")))).select("doc_id")
      val removed = diff.filter(col("pt").isNotNull && col("ct").isNull)
        .select("doc_id")
      val (pairsUp, bandedUp, _) = TextDedup.upsertLshPairs(
        s.table(pairsTbl), s.table(lshTbl), curr, changed, removed,
        "doc_id", "text", n = 3, numPerm = 128, bands = 32, threshold = 0.8)
      t("write pairs_v2") {
        graft.sources.ParquetSink.writeBucketedSnapshot(pairsUp,
          pairsTbl + "_v2", Seq("doc_a"), buckets = 16)
      }
      t("write lsh_v2") {
        graft.sources.ParquetSink.writeLshIndex(bandedUp,
          lshTbl + "_v2", buckets = 16)
      }
      val added = s.table(pairsTbl + "_v2")
        .join(s.table(pairsTbl), Seq("doc_a", "doc_b"), "left_anti")
      val seeds = changed.unionByName(removed)
        .unionByName(added.select(col("doc_a").as("doc_id")))
        .unionByName(added.select(col("doc_b").as("doc_id")))
      val clustersUp = t("upsertClusters compute+write") {
        val cu = Clustering.upsertClusters(
          s.table(clusTbl), s.table(pairsTbl + "_v2"), seeds)
        graft.sources.ParquetSink.writeBucketedSnapshot(cu,
          clusTbl + "_v2", Seq("doc_id"), buckets = 16)
      }
      t("noop read v2") {
        s.table(clusTbl + "_v2")
          .write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
