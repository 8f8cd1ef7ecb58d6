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
  *
  * FAULT-INJECTION mode (r17): with `SPARK_GRAFT_KILL_PID=<worker
  * jvm pid>` (and optionally `SPARK_GRAFT_KILL_AFTER_STAGES=<n>`,
  * default 8), the smoke runs exactly ONE query ONCE, and a stage
  * listener SIGKILLs that worker the moment the n-th stage of the
  * query completes — i.e. mid-job, deterministically, not by a
  * sleep race. Spark must then reschedule onto the surviving
  * worker(s): lost shuffle blocks recompute via FetchFailed stage
  * resubmission, lost cache blocks recompute from lineage, and
  * reliable-checkpoint files (SPARK_GRAFT_CKPT_DIR on shared
  * storage) survive the dead executor outright. The emitted checksum
  * must equal the uninterrupted run's — that equality IS the
  * fault-tolerance witness. (Negative control: the same kill with
  * localCheckpoint lineage truncation is EXPECTED to fail the query
  * — executor-local checkpoint blocks die with the executor — which
  * is why iterative operators switch to reliable checkpoints when a
  * checkpoint dir is set.)
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
    // works on both shapes — the env knob mirrors Bench's
    sys.env.get("SPARK_GRAFT_CKPT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    // memory-pressure doctrine (r18→r19): under a squeezed heap the
    // FIRST casualty is the broadcast hash-relation build (an
    // explicit SparkOutOfMemory, measured at 2g/sf3), long before
    // the sort/agg paths need to spill — so the threshold is now
    // AUTO-SIZED from the executor heap (Sessions' clamp(heap/256)
    // rule; heap/128 was measured to still OOM the hash-relation
    // build at 2 g) instead of requiring the operator to know it. The
    // env override remains for probes that measure the rule itself.
    val autoBcast =
      Sessions.broadcastThresholdFor(Sessions.executorHeapBytes(spark))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BCAST", autoBcast.toString))
    System.err.println(s"[smoke] broadcast threshold: " +
      s"${spark.conf.get("spark.sql.autoBroadcastJoinThreshold")} " +
      s"(auto=$autoBcast, heap=${Sessions.executorHeapBytes(spark)})")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // decade-scaled AQE initialPartitionNum (r19 sf30 doctrine, r20
    // application point — see Sessions.shufflePartitionsFor):
    // shuffles plan wide, AQE coalesces the small ones back.
    // SPARK_GRAFT_SHUFFLE pins raw partitions for rule probes.
    // AFTER the warm-up job: on a cluster master defaultParallelism
    // reads 2 until executors register (the r20 2-worker smoke
    // measured applied=2 before the first job), and the helper's
    // raw-conf floor is the backstop, not the sizing path.
    val applied = Sessions.applyShufflePartitions(
      spark, sfDir, spark.sparkContext.defaultParallelism)
    System.err.println(s"[smoke] partitions: raw=" +
      s"${spark.conf.get("spark.sql.shuffle.partitions")} " +
      s"applied=$applied " +
      s"(manual=${sys.env.contains("SPARK_GRAFT_SHUFFLE")}, " +
      s"bytes=${Sessions.localDataBytes(sfDir)})")

    // fault-injection arm (see object doc): kill the given worker JVM
    // after the n-th completed stage of the measured query
    val killPid = sys.env.get("SPARK_GRAFT_KILL_PID").map(_.trim.toLong)
    val killAfter =
      sys.env.getOrElse("SPARK_GRAFT_KILL_AFTER_STAGES", "8").toInt
    val killFired = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
    killPid.foreach { pid =>
      require(names.size == 1,
        "kill mode runs exactly one query (stage counting is global)")
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              ev: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            if (stageCount.incrementAndGet() == killAfter &&
              killFired.compareAndSet(false, true)) {
              System.err.println(
                s"[smoke] KILL: SIGKILL worker pid $pid (+ child " +
                  s"executors) after $killAfter completed stages")
              // the worker's executors are CHILD processes — a bare
              // SIGKILL of the worker would orphan them still serving
              // tasks, simulating nothing; kill the children first
              new ProcessBuilder("bash", "-c",
                s"pkill -9 -P $pid; kill -9 $pid")
                .start().waitFor(): Unit
            }
          }
        })
    }

    // spill telemetry (r18): memory-pressure runs must PROVE the
    // squeeze spilled, not just that it survived — a "passed at 4g"
    // row with zero spill would mean the squeeze never bit. Summed
    // across every task of a query's TIMED reps (counters reset
    // after the discarded warm-up, behind a listener-bus flush so
    // the warm-up's async TaskEnd tail can't leak into the timed
    // window — r18 over-reported ~1.5x by counting the warm-up).
    val memSpilled = new java.util.concurrent.atomic.AtomicLong(0)
    val diskSpilled = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (t.taskMetrics != null) {
            memSpilled.addAndGet(t.taskMetrics.memoryBytesSpilled): Unit
            diskSpilled.addAndGet(t.taskMetrics.diskBytesSpilled): Unit
          }
      })

    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    val qs = SparkEntry.queries
    def resetSpill(): Unit = {
      // drain the bus first: set(0) with events still in flight
      // attributes the previous job's spill tail to the next window
      org.apache.spark.sql.graftshim.ListenerBusShim
        .flush(spark.sparkContext): Unit
      memSpilled.set(0)
      diskSpilled.set(0)
    }
    val times = names.map { name =>
      require(qs.contains(name), s"unknown query $name")
      resetSpill()
      var checksum: String = "null"
      // Bench's per-query failure guard: one query failing (e.g. a
      // cluster-only misconfiguration — exactly what a smoke exists
      // to surface) must cost that ROW, never the whole run's JSON.
      // Kill mode runs the query ONCE: a warm-up would consume the
      // stage budget (and recover the fault before the timed run),
      // defeating the injection.
      // Protocol knobs (r20): SPARK_GRAFT_REPS = timed runs (default
      // 2, min-of-N), SPARK_GRAFT_WARMUP=0 skips the discarded
      // warm-up — for 250-450 s/query scale probes the ~2-5 s JIT
      // constant is noise and a 3-run protocol triples a half-hour
      // measurement for nothing; defaults unchanged for the
      // sub-minute smokes where JIT is NOT noise.
      val timedReps =
        math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt)
      val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
      val runIdxs =
        if (killPid.isDefined) 0 to 0
        else (if (warmup) 0 else 1) to timedReps
      val runs = runIdxs.map { i =>
        // spill_mb covers the TIMED reps only: zero the counters at
        // the first timed run, after the warm-up's events drained
        if (i == 1) resetSpill()
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
      // kill mode has no discarded warm-up — its single run IS timed
      val timed =
        if (killPid.isDefined || !warmup) runs else runs.drop(1)
      val okTimes = timed.collect { case (dt, true) => dt }
      val t = if (okTimes.nonEmpty && timed.forall(_._2))
        Some(okTimes.min) else None
      System.err.println(t match {
        case Some(v) => String.format(java.util.Locale.ROOT,
          "[smoke] %s %.2f s (first %.2f)", name,
          Double.box(v), Double.box(runs.head._1))
        case None => s"[smoke] $name FAILED"
      })
      // flush before the read, too: the last rep's TaskEnd tail is
      // still async at this point
      org.apache.spark.sql.graftshim.ListenerBusShim
        .flush(spark.sparkContext): Unit
      (name, t, checksum, memSpilled.get(), diskSpilled.get())
    }
    val master = spark.sparkContext.master
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length
    val killJson = killPid match {
      case Some(pid) =>
        s""","kill":{"pid":$pid,"after_stages":$killAfter,"fired":${killFired.get()},"stages_seen":${stageCount.get()}}"""
      case None => ""
    }
    println(s"""{"metric":"cluster_smoke","master":"$master","executors":$execs,"sf":"$sfDir","queries":{${times.map { case (n, t, _, _, _) => s"\"$n\":${t.map(fmt).getOrElse("null")}" }.mkString(",")}},"checksums":{${times.map { case (n, _, c, _, _) => s"\"$n\":$c" }.mkString(",")}},"spill_mb":{${times.map { case (n, _, _, m, dk) => s"\"$n\":[${m / 1048576},${dk / 1048576}]" }.mkString(",")}},"failed":[${times.collect { case (n, None, _, _, _) => s"\"$n\"" }.mkString(",")}],"total":${fmt(times.flatMap(_._2).sum)}$killJson}""")
    spark.stop()
  }
}
