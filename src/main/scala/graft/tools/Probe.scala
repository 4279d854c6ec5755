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
