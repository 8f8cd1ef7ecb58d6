package graft

import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Round-22 adjudication probe for the sc_grn/sc_pathways/sc_cellcycle
  * driver-run regression cluster (VERDICT r21 item 1): times the named
  * queries exactly the way Bench does (checksum action, clearCache+GC
  * between reps, one discarded warm-up, min-of-3) with the r21
  * cached-plan-coalescing flag set from SPARK_GRAFT_CACHED_COALESCE
  * (on|off) so the two arms differ ONLY in that flag at fixed heap.
  * Run arms as alternating fresh JVMs (A B A B) — the only same-box
  * protocol that separates a real mechanism from session noise.
  *
  *   SPARK_GRAFT_CACHED_COALESCE=off sbt "Test/runMain graft.ScAdjudicate sc_grn ..."
  */
object ScAdjudicate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val flag = sys.env.getOrElse("SPARK_GRAFT_CACHED_COALESCE", "on") match {
      case "on" => "true"
      case "off" => "false"
      case other => sys.error(s"SPARK_GRAFT_CACHED_COALESCE must be on|off, got $other")
    }
    // optional extra session confs for one-flag A/B arms:
    //   SPARK_GRAFT_PROBE_CONF="k=v;k2=v2"
    val extra = sys.env.get("SPARK_GRAFT_PROBE_CONF").toSeq
      .flatMap(_.split(";")).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = extra.foldLeft(
      Sessions.localBuilder(32)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", flag)
    ) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.applyShufflePartitions(spark, sfDir, 32): Unit
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else Seq("sc_grn")
    println(s"ARM coalesce=$flag")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (0 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
          .collect()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        dt
      }
      println(String.format(java.util.Locale.ROOT,
        "PROBE %s coalesce=%s min=%.3f times=%s", name, flag,
        Double.box(times.drop(1).min),
        times.map(t => String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(t))).mkString(",")))
    }
    spark.stop()
  }
}
