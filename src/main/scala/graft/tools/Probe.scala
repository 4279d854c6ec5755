package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for stage-level timing of the hot operators (not part of the
  * driver contract).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.codegen.maxFields", sys.env.getOrElse("MAXFIELDS", "100"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    if (sys.env.contains("AQECMP")) {
      val names = Seq("q1_pricing_agg", "snapshot_diff_updates", "pk_reconcile_missing",
        "join_revenue_nation", "dedup_minhash_lsh", "events_sessionize")
      def runAll(label: String): Unit = {
        val t0 = System.nanoTime()
        names.foreach { n =>
          graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        println(f"[aqe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      runAll("warmup")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      runAll("aqe on ")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      runAll("aqe off")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      runAll("aqe on2")
      spark.stop(); return
    }
    if (sys.env.contains("TOPK")) {
      import org.apache.spark.sql.expressions.Window
      val df = spark.range(20000000L).select(
        (col("id") % 40).as("g"),
        (col("id") * 2654435761L % 1000000007L).as("score"),
        col("id"))
      df.write.format("noop").mode("overwrite").save() // warm
      def t(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[topk] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      t("window row_number k=10") {
        df.withColumn("rank", org.apache.spark.sql.functions.row_number().over(
            Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
          .filter(col("rank") <= 10)
          .write.format("noop").mode("overwrite").save()
      }
      t("TopKPerGroup k=10") {
        org.apache.spark.sql.graft.TopKPerGroup(df, Seq(col("g")),
            Seq(col("score").desc, col("id")), 10)
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop(); return
    }
    if (sys.env.contains("SCALE")) {
      // Scale-up probe: replicate sf0.1 k times with shifted keys and
      // measure headline operators vs the 1x base — evidence that the
      // plans scale near-linearly in input volume (SURVEY §3).
      import org.apache.spark.sql.DataFrame
      val k = sys.env("SCALE").toInt
      val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
      def replicate(table: String, keyCols: Seq[String]): String = {
        val base = spark.read.parquet(s"$sfDir/$table.parquet")
        val shift = 10000000L
        val parts = (0 until k).map { i =>
          keyCols.foldLeft(base) { (d, c) =>
            d.withColumn(c, col(c) + lit(i * shift)) }
        }
        val out = s"$dir/$table.parquet"
        parts.reduce(_ unionByName _).write.mode("overwrite").parquet(out)
        out
      }
      replicate("lineitem", Seq("l_orderkey"))
      replicate("orders", Seq("o_orderkey", "o_custkey"))
      replicate("documents", Seq("doc_id"))
      // customers/dims stay 1x: scaling facts against fixed dims is the
      // realistic shape (the shifted custkeys just miss the dim join).
      // Plain file copies — no Spark rewrite (events holds nano timestamps
      // Spark won't re-write).
      for (t <- Seq("customer", "supplier", "part", "nation", "region",
                    "events", "embeddings"))
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$sfDir/$t.parquet"),
          java.nio.file.Paths.get(s"$dir/$t.parquet"))
      val names = sys.env.getOrElse("SCALEQ",
        "q1_pricing_agg,snapshot_diff_updates,tile_assign,dedup_exact,doc_fingerprint,counter_deltas").split(",")
      for (name <- names) {
        def run(d: String): Double = {
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, d)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        run(sfDir); run(dir) // warm both inputs
        val base = run(sfDir)
        val scaled = run(dir)
        println(f"[scale] $name: 1x=$base%.2f s ${k}x=$scaled%.2f s ratio=${scaled / base}%.1f (ideal <= $k)")
      }
      spark.stop(); return
    }
    for (name <- sys.env.getOrElse("AUDIT", "q1_pricing_agg").split(",")) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()   // force AQE final plan
      val plan = df.queryExecution.executedPlan.toString
      println(s"[audit] $name: exchanges=" + "Exchange hashpartitioning".r.findAllIn(plan).length +
        " broadcasts=" + "BroadcastExchange".r.findAllIn(plan).length +
        " wscg=" + "WholeStageCodegen".r.findAllIn(plan).length)
      plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
        .take(6).foreach(l => println("[audit]   " + l.trim.take(240)))
    }
    spark.stop()
  }
}
