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
    // parity with Bench: decade-scaled AQE initialPartitionNum
    // (identical through sf10; SPARK_GRAFT_SHUFFLE = probe mode)
    Sessions.applyShufflePartitions(spark, sfDir, 32): Unit
    // parity with Bench: opt-in reliable checkpointing for the CC
    // iteration (the sf10 memory-pressure knob)
    sys.env.get("SPARK_GRAFT_CKPT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
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
        // parity with Bench: the explicit GC is load-bearing — the
        // ContextCleaner reclaims finished shuffles/broadcasts only
        // when their weak refs are collected, and without the nudge
        // the backlog from earlier runs inflates later runs' times
        // (observed monotonically GROWING repeats without it)
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      println(s"TIMES $name: ${times.map(t =>
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(t))).mkString(", ")}")
      val df = fn(spark, sfDir)
      df.collect()
      // flag any RAW fact-table scan under a broadcast exchange
      // (shared walker: same rules as PlanAuditSpec)
      if (PlanWalk.broadcastsRawScan(
          df.queryExecution.executedPlan, "lineitem.parquet"))
        println(s"FACT-BCAST $name: raw lineitem under BroadcastExchange")
      val bcasts = PlanWalk.expand(df.queryExecution.executedPlan)
        .count(_.isInstanceOf[
          org.apache.spark.sql.execution.exchange.BroadcastExchangeExec])
      println(s"BCASTS $name: $bcasts")
      // the audit collect above is UNCOUNTED — clear its cache so it
      // cannot flatter the next group's first rep (the r18 sc_grn
      // adjudication measured a warm refill at ~55% of a cleared
      // rep's wall; leaking it widens every adjudication band)
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
