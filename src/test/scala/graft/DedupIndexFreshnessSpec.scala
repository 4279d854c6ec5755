package graft

import org.apache.spark.sql.functions._

/** The materialized dedup index must rebuild when the corpus under it is
  * regenerated in-place: freshness is keyed on a metadata-only file
  * fingerprint (name, length, mtime), not table existence, so a report
  * run without the roundtrip entry can never silently read a stale
  * pairs/membership snapshot.
  */
class DedupIndexFreshnessSpec extends SparkSpec {

  private def writeDocs(dir: String, nDups: Int): Unit = {
    // nDups identical docs (one duplicate cluster of size nDups) plus
    // two distinct singletons; texts long enough to shingle at n = 3
    val spark0 = spark
    import spark0.implicits._
    val dup = (0 until nDups).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta theta", "en", "web"))
    val singles = Seq(
      (900L, "one two three four five six seven eight nine", "en", "web"),
      (901L, "red orange yellow green blue indigo violet ultraviolet", "en", "web"))
    (dup ++ singles).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .coalesce(1)
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
  }

  test("report rebuilds the index when the corpus changes under it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fresh")
      .toFile.getAbsolutePath

    def clusterSizes(): Map[Long, Long] =
      SparkEntry.queries("cluster_size_histogram")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    writeDocs(dir, nDups = 3)
    assert(clusterSizes() === Map(3L -> 1L))

    // regenerate the corpus in-place: the stamped fingerprint no longer
    // matches, so the report must rebuild — pre-fix it returned the
    // stale size-3 histogram because the tables still existed
    writeDocs(dir, nDups = 4)
    assert(clusterSizes() === Map(4L -> 1L))

    // unchanged corpus: the index is NOT rebuilt (same table mtime)
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "dedup_pairs_" + dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = fs.getFileStatus(warehouse).getModificationTime
    assert(clusterSizes() === Map(4L -> 1L))
    assert(fs.getFileStatus(warehouse).getModificationTime === before,
      "unchanged corpus must not trigger a rebuild")
  }
}
