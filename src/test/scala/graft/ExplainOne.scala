package graft

/** Test-scope plan inspector: print each named query's formatted plan
  * scan section — ReadSchema (column pruning), PushedFilters and
  * PartitionFilters — plus exchange/aggregate counts, so pushdown
  * regressions can be eyeballed without a debugger. Usage:
  *   sbt "Test/runMain graft.ExplainOne <query> [query ...]"
  * (SPARK_GRAFT_SF_DIR selects the scale factor, default sf0.001.)
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.localBuilder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_pricing_summary")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      println(s"===== $name =====")
      plan.linesIterator
        .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters")
          || l.contains("PartitionFilters"))
        .foreach(l => println("  " + l.trim.take(200)))
      val lines = plan.linesIterator.toSeq
      println(s"  exchanges=${lines.count(_.contains("Exchange"))} " +
        s"aggregates=${lines.count(_.contains("HashAggregate"))} " +
        s"windows=${lines.count(_.contains("Window"))} " +
        s"scans=${lines.count(_.contains("Scan parquet"))}")
    }
    spark.stop()
  }
}
