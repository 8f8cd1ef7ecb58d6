package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions.{col, sum, xxhash64}
import scala.collection.mutable

/** Dev harness (r21): per-job timeline of one query — job start
  * offsets, durations and the driver-side GAPS between jobs (planning,
  * codegen, broadcast builds), so fixed overhead is attributable.
  *
  *   sbt "Test/runMain graft.JobTimeline <query> [query...]"
  */
object JobTimeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.applyShufflePartitions(spark, sfDir, 32): Unit
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    case class J(id: Int, start: Long, var end: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val stages = mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(j.jobId) = J(j.jobId, j.time) }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(j.jobId).foreach(_.end = j.time) }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        stages.synchronized { stages += f"stage ${i.stageId}%4d tasks=${i.numTasks}%3d " +
          f"wall=${i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)}%5d ms " +
          f"exec=${m.executorRunTime}%6d ms gc=${m.jvmGCTime}%4d ms " +
          f"deser=${m.executorDeserializeTime}%5d ms  ${i.name.take(90)}" }
      }
    })

    args.toSeq.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up
      val w = fn(spark, sfDir)
      w.agg(sum(xxhash64(w.columns.map(col): _*).cast("decimal(38,0)"))).collect()
      spark.catalog.clearCache(); System.gc()
      jobs.synchronized { jobs.clear() }
      stages.synchronized { stages.clear() }
      val t0 = System.currentTimeMillis()
      val df = fn(spark, sfDir)
      val tPlan = System.currentTimeMillis()
      df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).collect()
      val tEnd = System.currentTimeMillis()
      Thread.sleep(200)
      println(s"=== $name total=${tEnd - t0} ms (fn+eager=${tPlan - t0} ms) ===")
      var prevEnd = t0
      var gapSum = 0L; var jobSum = 0L
      jobs.synchronized { jobs.values.toSeq.sortBy(_.start) }.foreach { j =>
        val gap = j.start - prevEnd
        gapSum += math.max(0, gap); jobSum += (j.end - j.start)
        println(f"  job ${j.id}%4d  +${j.start - t0}%6d ms  gap=${gap}%5d ms  dur=${j.end - j.start}%5d ms")
        prevEnd = math.max(prevEnd, j.end)
      }
      println(s"  SUM: jobs=$jobSum ms, driver-gaps=$gapSum ms, tail=${tEnd - prevEnd} ms")
      stages.synchronized { stages.toSeq }.foreach(s => println("  " + s))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
