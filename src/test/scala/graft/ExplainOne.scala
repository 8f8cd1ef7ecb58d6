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
    // static inspection: AQE wraps the plan in an AdaptiveSparkPlanExec
    // leaf whose inner plan only materializes on execution — disable it
    // so the pre-execution tree is the full tree
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val names =
      if (args.sameElements(Array("ALL"))) SparkEntry.allDefs.map(_.name)
      else if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary")
    val verbose = !args.sameElements(Array("ALL"))
    val summary = names.map { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      if (verbose) {
        println(s"===== $name =====")
        plan.linesIterator
          .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters")
            || l.contains("PartitionFilters"))
          .foreach(l => println("  " + l.trim.take(200)))
      }
      // count by TREE traversal, not plan-string lines: InMemoryRelation
      // re-prints its cached child plan in toString, so a cached subtree
      // read twice would string-count its scans twice even though the
      // executing plan reads the cache once. Walk children + innerChildren
      // (subqueries print through innerChildren) but stop at InMemory*
      // nodes — below them is the cached build plan, not executed work.
      import org.apache.spark.sql.catalyst.trees.TreeNode
      def walk(t: TreeNode[_]): Seq[TreeNode[_]] =
        if (t.nodeName.startsWith("InMemory")) Seq(t)
        else t +: (t.children ++ t.innerChildren)
          .collect { case c: TreeNode[_] => c }.flatMap(walk).toSeq
      val nodes = walk(df.queryExecution.executedPlan)
      def cnt(pred: String => Boolean): Int =
        nodes.count(n => pred(n.nodeName))
      val counts = (
        cnt(_.contains("Exchange")),
        cnt(_.contains("HashAggregate")),
        cnt(_.contains("Window")),
        cnt(n => n.contains("Scan parquet") || n.contains("FileSourceScan")),
        cnt(_.contains("InMemoryTableScan")))
      if (verbose)
        println(s"  exchanges=${counts._1} aggregates=${counts._2} " +
          s"windows=${counts._3} scans=${counts._4} cacheReads=${counts._5}")
      (name, counts)
    }
    if (!verbose) {
      println("name exchanges aggregates windows scans cacheReads")
      summary.sortBy(-_._2._4).foreach { case (n, (e, a, w, s, c)) =>
        println(f"$n%-24s $e%3d $a%3d $w%3d $s%3d $c%3d")
      }
    }
    spark.stop()
  }
}
