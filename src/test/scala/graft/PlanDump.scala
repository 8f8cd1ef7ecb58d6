package graft

/** Dev harness (r21): dump each named query's formatted physical plan
  * to plans/<tag>/<query>_<suffix>.txt for before/after plan evidence.
  *
  *   sbt "Test/runMain graft.PlanDump <suffix> <query> [query ...]"
  * (SPARK_GRAFT_SF_DIR selects the corpus, default sf0.1;
  *  SPARK_GRAFT_PLAN_DIR the output dir, default plans/r21.)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query> [query ...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r21")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.applyShufflePartitions(spark, sfDir, 32): Unit
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // "formatted" pre-execution plan; with AQE the pre-execution
      // tree is the initial plan — run the query first so the dump
      // carries the FINAL adaptive plan (the shape that executed)
      df.collect()
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), finalPlan)
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
