package graft

import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Test-scope single-query bench reproducer: times one query exactly
  * the way Bench does (checksum action, clearCache between runs) and
  * prints the AQE final executed plan so regressions can be diagnosed
  * without a full bench sweep.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else Seq("q5_region_revenue")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
          .collect()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(s"TIMES $name: ${times.map(t => f"$t%.3f").mkString(", ")}")
      val df = fn(spark, sfDir)
      df.collect()
      // flag any fact-table scan that sits under a broadcast exchange
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def expand(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
        case q: QueryStageExec => p +: expand(q.plan)
        case _ => p +: p.children.flatMap(expand)
      }
      val bcastSubtrees = expand(df.queryExecution.executedPlan)
        .collect { case b: BroadcastExchangeExec => b }
      bcastSubtrees.foreach { b =>
        val scans = expand(b).filter(_.toString.contains("lineitem.parquet"))
        if (scans.nonEmpty) println(s"FACT-BCAST $name: lineitem under BroadcastExchange")
      }
      println(s"BCASTS $name: ${bcastSubtrees.size}")
    }
    spark.stop()
  }
}
