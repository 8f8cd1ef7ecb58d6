package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Shared AQE-aware physical-plan traversal for plan audits (used by
  * PlanAuditSpec and the BenchOne reproducer — ONE copy so a new AQE
  * node type fixed here can't desynchronize the test from the tool).
  */
object PlanWalk {

  /** Flatten a plan, descending through AQE wrappers and into the
    * plans wrapped by (leaf) query-stage nodes.
    */
  def expand(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
    case q: QueryStageExec => p +: expand(q.plan)
    case _ => p +: p.children.flatMap(expand)
  }

  /** True iff some broadcast exchange's build relation contains a raw
    * (not aggregated) scan of `table` — the shape that inverts a join
    * the moment the fact side outgrows the broadcast threshold. An
    * aggregate between the scan and the broadcast means the broadcast
    * relation is the (small) aggregate output: allowed. Query stages
    * are descended into, not string-matched — a stage's toString
    * prints its whole subtree and would misclassify an aggregated
    * relation wrapped in a reused stage.
    */
  def broadcastsRawScan(plan: SparkPlan, table: String): Boolean = {
    def rawScan(p: SparkPlan): Boolean = p match {
      case _: BaseAggregateExec => false
      case a: AdaptiveSparkPlanExec => rawScan(a.executedPlan)
      case q: QueryStageExec => rawScan(q.plan)
      // a cache read is as raw as its BUILD plan: descend and apply
      // the same aggregate-blocks-raw rule (the leaf's toString prints
      // the whole InMemoryRelation, so string-matching it would flag a
      // cached aggregate output as a raw scan)
      case c: InMemoryTableScanExec => rawScan(c.relation.cachedPlan)
      case s if s.children.isEmpty => s.toString.contains(table)
      case s => s.children.exists(rawScan)
    }
    expand(plan)
      .collect { case b: BroadcastExchangeExec => b }
      .exists(b => rawScan(b.child))
  }
}
