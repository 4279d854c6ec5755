package graft

/** Physical-plan regression checks: the properties that make these plans
  * scale (pushdown, pruning, broadcast dims) must survive refactors. The
  * plans are inspected AFTER an action so AQE has finalized them.
  */
class PlanSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("q1 scan prunes columns and pushes the date filter") {
    val plan = finalPlan("q1_pricing_agg")
    val scanLine = plan.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("l_shipdate"), "pushed filter on shipdate expected")
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_partkey"),
      "unused columns must not reach the scan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("join_revenue_nation broadcasts the dimension tables") {
    val plan = finalPlan("join_revenue_nation")
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 2, s"nation+region must broadcast, got $broadcasts:\n$plan")
  }

  test("source_scan_project is a pure scan: no exchange at all") {
    val plan = finalPlan("source_scan_project")
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,O)]"))
  }

  test("snapshot diff pushes both snapshot predicates into the scans") {
    val plan = finalPlan("snapshot_diff_updates")
    val scans = plan.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scans.size == 2)
    assert(scans.forall(_.contains("o_orderkey")), "PK filters should reach scans")
  }
}
