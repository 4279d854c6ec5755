package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.execution.SparkPlanInfo
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
import org.apache.spark.sql.functions._

import graft.operators.{Ann, Clustering}

/** No-re-derivation gate for `knn_components` (the one kNN reader the
  * plan-string PlanSpec cannot see: Clustering's eager localCheckpoints
  * truncate lineage, so its FINAL plan is a Scan ExistingRDD). The gate
  * instead listens to every SQL execution the entry RUNS — eager
  * checkpoints included, each fires SparkListenerSQLExecutionStart with
  * its physical-plan tree — and asserts the entry (a) scans the standing
  * edge-index table and (b) never executes a TopKPerGroup stage, the
  * operator only the edge DERIVATION uses. The second test proves the
  * gate has teeth: the same capture over a knnGraph-based recompute DOES
  * see TopKPerGroup.
  */
class KnnComponentsGateSpec extends SparkSpec {

  /** Node names + plan strings of every SQL execution started by `body`
    * ON THIS TEST's call stack (suites run in parallel in one JVM, so
    * events are filtered by the action callsite in `details`).
    */
  private def capturePlans(body: => Unit): Seq[String] = {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val marker = getClass.getSimpleName
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit =
        event match {
          case e: SparkListenerSQLExecutionStart
              if e.details != null && e.details.contains(marker) =>
            def walk(p: SparkPlanInfo): Unit = {
              plans.add(p.nodeName + " :: " + p.simpleString); ()
              p.children.foreach(walk)
            }
            walk(e.sparkPlanInfo)
          case _ =>
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      // the listener bus is async and a fixed sleep is racy either way
      // (late TopKPerGroup events would make the NO-derivation assert
      // pass vacuously). Drain deterministically: post a SENTINEL action
      // from this same thread — the bus is FIFO, so once the sentinel's
      // event is visible every earlier event has been delivered.
      spark.range(7777001).filter(col("id") === 7777000L).count()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!plans.toArray.exists(_.toString.contains("7777001")) &&
             System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(plans.toArray.exists(_.toString.contains("7777001")),
        "sentinel event never arrived — listener bus drain failed")
    } finally spark.sparkContext.removeSparkListener(listener)
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq.filterNot(_.contains("7777001"))
  }

  test("knn_components runs zero edge-derivation stages, reads the standing index") {
    // the roundtrip entry owns the build; prime OUTSIDE the capture
    SparkEntry.queries("knn_graph_index_roundtrip")(spark, sfDir).count()
    val plans = capturePlans {
      val n = SparkEntry.queries("knn_components")(spark, sfDir).count()
      assert(n > 0); ()
    }
    assert(plans.nonEmpty, "gate captured no executions — callsite filter broke")
    assert(!plans.exists(_.contains("TopKPerGroup")),
      s"knn_components re-derived edges:\n${plans.filter(_.contains("TopKPerGroup")).mkString("\n")}")
    assert(plans.exists(_.contains("knn_edge_index_")),
      s"knn_components never scanned the standing edge table:\n${plans.take(20).mkString("\n")}")
  }

  test("the gate fails a re-deriving implementation (teeth check)") {
    val emb = Tables.embeddings(spark, sfDir)
    val plans = capturePlans {
      // what the entry would do WITHOUT the standing index: assign +
      // bucket self-join + bounded-heap top-k, then components
      val cents = emb.filter(col("vec_id") % 25 === 0)
      val edges = Ann.knnGraph(emb,
          Ann.ivfAssign(emb, cents, "vec_id", "embedding",
            "vec_id", "embedding"),
          "vec_id", "embedding", k = 3)
        .filter(col("cosine") >= 0.35)
        .select(col("query_id").as("a"), col("neighbor_id").as("b"))
      val n = Clustering.dedupClusters(edges, "a", "b").count()
      assert(n > 0); ()
    }
    assert(plans.exists(_.contains("TopKPerGroup")),
      "the gate would not catch an edge re-derivation")
  }
}
