package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Dev harness (round-21 optimization): split every declared query's
  * bench wall into ANALYSIS (plan build + optimize + physical plan)
  * vs EXECUTION, and count jobs / stages / tasks / shuffle bytes per
  * query, so optimization effort lands where the time actually goes.
  * Mirrors Bench's methodology (checksum action, clearCache + GC
  * between runs, one discarded warm-up).
  *
  *   sbt "Test/runMain graft.ProfileAll [query ...]"
  */
object ProfileAll {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.localBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.applyShufflePartitions(spark, sfDir, cpus): Unit
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shufWrite = 0L
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        shufWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks += 1
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println("query,total_s,analysis_s,exec_s,jobs,stages,tasks,shuffle_kb")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up (discarded, pays codegen/JIT)
      try {
        val df = fn(spark, sfDir)
        df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).collect()
      } catch { case e: Throwable => println(s"$name,FAILED,${e.getClass.getSimpleName}") }
      spark.catalog.clearCache(); System.gc()
      // timed run, split into analysis vs execution
      try {
        jobs = 0; stages = 0; tasks = 0; shufWrite = 0L
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val agg = df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
        agg.queryExecution.executedPlan // forces analysis+optimization+planning
        val t1 = System.nanoTime()
        agg.collect()
        val t2 = System.nanoTime()
        Thread.sleep(120) // let listener events drain
        def f(n: Long) = String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(n / 1e9))
        println(s"$name,${f(t2 - t0)},${f(t1 - t0)},${f(t2 - t1)},$jobs,$stages,$tasks,${shufWrite / 1024}")
      } catch { case e: Throwable => println(s"$name,FAILED,${e.getClass.getSimpleName}") }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
