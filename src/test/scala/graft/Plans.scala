package graft

import org.apache.spark.sql.SparkSession

/** Test-scope plan audit: prints key physical-plan facts for the
  * headline queries so shuffle/pushdown regressions are visible at a
  * glance (PLAN lines: exchanges, broadcasts, pushed filters,
  * whole-stage codegen spans).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q1_pricing_summary", "q5_region_revenue", "bm25_search",
      "vs_dense_topk", "vs_ann_ivf", "dedup_minhash_lsh", "emb_tfidf")
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, d).queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
      val exchanges = lines.count(_.contains("Exchange"))
      val bcasts = lines.count(_.contains("BroadcastExchange"))
      val windows = lines.count(_.trim.startsWith("Window"))
      val pushed = lines.filter(_.contains("PushedFilters: [")).map(_.trim.take(120))
      val wsc = lines.count(_.contains("WholeStageCodegen"))
      println(s"PLAN $n exchanges=$exchanges broadcast=$bcasts windows=$windows wscg=$wsc")
      pushed.take(3).foreach(p => println(s"PLAN   $n pushed: $p"))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
