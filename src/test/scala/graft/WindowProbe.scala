package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec

/** Test-scope probe: sweep every shipped query, execute it, and list
  * each unpartitioned WindowExec (the "No Partition Defined" WARN
  * class — Spark moves the whole frame to ONE partition) together
  * with its measured input row count. Feeds the PlanAuditSpec
  * bounded-window whitelist: every hit must be a panel/bounded frame
  * by design, and the spec pins the row counts so a future operator
  * can never silently put a corpus-scale frame under a global window.
  * Usage: sbt "Test/runMain graft.WindowProbe" (SPARK_GRAFT_SF_DIR
  * selects scale, default sf0.001.)
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.localBuilder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = if (args.nonEmpty) args.toSet else Set.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        try {
          val df = fn(spark, sfDir)
          df.collect()
          PlanWalk.unpartitionedWindows(df.queryExecution.executedPlan)
            .foreach { w =>
              println(s"HIT\t$name\tinputRows=" +
                s"${PlanWalk.windowInputRows(w).getOrElse(-1L)}\t" +
                s"metrics=${w.metrics.keys.mkString(",")}")
            }
        } catch { case e: Throwable =>
          println(s"ERR\t$name\t${e.getMessage}")
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
