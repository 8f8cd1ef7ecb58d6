package graft.tools

import org.apache.spark.sql.functions.{col, sum, xxhash64}

import graft.{Sessions, SparkEntry}

/** Dev harness: run a handful of headline queries on WHATEVER master
  * spark-submit provides — the multi-executor smoke that converts the
  * "no driver bottleneck" claim from plan-reading to measurement
  * (r14/r15 verdict stretch item). Usage:
  *
  * {{{
  *   sbt package
  *   /opt/spark/sbin/start-master.sh -h 127.0.0.1
  *   /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 ... (x2)
  *   /opt/spark/bin/spark-submit --master spark://127.0.0.1:7077 \
  *     --class graft.tools.ClusterSmoke target/scala-2.13/<jar> \
  *     /root/testdata/sf0.1 dedup_minhash_lsh,dedup_cluster,...
  * }}}
  *
  * Deliberately master-agnostic (Sessions.clusterBuilder carries no
  * master), so the SAME binary runs local[n] for the parity baseline
  * and spark://… for the standalone measurement. Timing protocol
  * mirrors Bench: one discarded warm-up, then min of 2 timed runs,
  * checksum-aggregated over every output column, cache cleared
  * between runs. NOT part of the library surface or driver contract.
  */
object ClusterSmoke {

  private val DefaultQueries = Seq(
    "dedup_minhash_lsh", "dedup_cluster", "corpus_dsir",
    "vs_ivf_pq", "pack_shards")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args(1).split(",").toSeq else DefaultQueries
    val spark = Sessions
      .clusterBuilder(
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16").toInt,
        "graft-cluster-smoke")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable checkpoints must be on shared storage under a real
    // cluster; localCheckpoint (the default) is executor-local and
    // works on both shapes
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = SparkEntry.queries
    val times = names.map { name =>
      require(qs.contains(name), s"unknown query $name")
      var checksum: String = "null"
      // Bench's per-query failure guard: one query failing (e.g. a
      // cluster-only misconfiguration — exactly what a smoke exists
      // to surface) must cost that ROW, never the whole run's JSON
      val runs = (0 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try {
          val df = qs(name)(spark, sfDir)
          // the checksum doubles as the RESULT-PARITY witness across
          // masters: identical rows → identical sum-of-row-hashes, so
          // diffing two smoke JSONs pins that the cluster computed
          // the same answer, not just a fast one
          val row = df.agg(sum(xxhash64(df.columns.map(col): _*)
            .cast("decimal(38,0)"))).collect().head
          checksum = if (row.isNullAt(0)) "null" else row.get(0).toString
          true
        } catch { case e: Throwable =>
          System.err.println(s"[smoke] $name FAILED: ${e.getMessage}")
          checksum = "null"
          false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        (dt, ok)
      }
      val okTimes = runs.drop(1).collect { case (dt, true) => dt }
      val t = if (okTimes.nonEmpty && runs.drop(1).forall(_._2))
        Some(okTimes.min) else None
      System.err.println(t match {
        case Some(v) => String.format(java.util.Locale.ROOT,
          "[smoke] %s %.2f s (warmup %.2f)", name,
          Double.box(v), Double.box(runs.head._1))
        case None => s"[smoke] $name FAILED"
      })
      (name, t, checksum)
    }
    val master = spark.sparkContext.master
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length
    println(s"""{"metric":"cluster_smoke","master":"$master","executors":$execs,"sf":"$sfDir","queries":{${times.map { case (n, t, _) => s"\"$n\":${t.map(fmt).getOrElse("null")}" }.mkString(",")}},"checksums":{${times.map { case (n, _, c) => s"\"$n\":$c" }.mkString(",")}},"failed":[${times.collect { case (n, None, _) => s"\"$n\"" }.mkString(",")}],"total":${fmt(times.flatMap(_._2).sum)}}""")
    spark.stop()
  }
}
