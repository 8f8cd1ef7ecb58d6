package graft

/** Physical-plan regression guards for the scale-critical properties
  * SURVEY §5 claims (pinned to the repo's Spark 4.1.2 — plan strings
  * are version-specific by design here). Runs against sf0.001 so the
  * audited plans are the exact production query plans, not toys.
  */
class PlanAuditSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.toString

  test("bm25 top-k terminates in TakeOrderedAndProject (no global sort)") {
    assert(planOf("bm25_search").contains("TakeOrderedAndProject"))
  }

  test("dense top-k never hash-exchanges the candidate side") {
    val plan = planOf("vs_dense_topk")
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("Exchange hashpartitioning"))
  }

  test("knnJoin plans a map-side partial ObjectHashAggregate") {
    val plan = planOf("vs_knn_join")
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window")) // bounded-agg path, not row_number
  }

  test("annIvf keeps assignment fold-based (no Window anywhere)") {
    assert(!planOf("vs_ann_ivf").contains("Window"))
    assert(!planOf("vs_ann_ivf_srp").contains("Window"))
  }

  test("metadata-filtered search pushes the predicate to the scan") {
    val plan = planOf("vs_filtered_topk")
    assert(plan.contains("PushedFilters"))
    // the label IN-filter must reach a parquet scan, not sit in a
    // post-scan Filter only
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("In(label")))
  }

  test("q1 pushes the shipdate filter into the parquet scan") {
    val plan = planOf("q1_pricing_summary")
    assert(plan.linesIterator.exists(l =>
      l.contains("PushedFilters") && l.contains("l_shipdate")))
  }
}
