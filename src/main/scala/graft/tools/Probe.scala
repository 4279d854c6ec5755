package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextDedup

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

    val docs = Tables.documents(spark, sfDir)

    time("warmup scan")(docs.count())
    val sh = graft.operators.TextDedup.shingleTable(docs, "doc_id", "text", 3)
    time("shingleTable")(sh.count())
    time("shingleTable again")(sh.count())
    time("minhash sig cols")(TextDedup.minhashSignatureCols(sh, 128).count())
    time("full lsh pairs")(
      TextDedup.minhashLshPairs(docs, "doc_id", "text", 3, 128, 32, 0.8).count())
    if (sys.env.contains("EXPLAIN")) {
      val plan = TextDedup.minhashLshPairs(docs, "doc_id", "text", 3, 128, 32, 0.8)
        .queryExecution.executedPlan.toString
      println("[plan] exchanges=" + "Exchange".r.findAllIn(plan).length +
        " reused=" + "ReusedExchange".r.findAllIn(plan).length +
        " wscg=" + "WholeStageCodegen".r.findAllIn(plan).length)
      println(plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Scan ")).mkString("\n"))
    }
    spark.stop()
  }
}
