package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Sessions
import graft.operators.Events
import graft.streaming.{ClosedSession, SessionEvent, StreamingAggs}

/** Dev harness: drive the STATEFUL streaming path (sessionizeStream —
  * flatMapGroupsWithState, event-time timeouts, the HDFS-backed state
  * store) end to end on WHATEVER master spark-submit provides, against
  * the real events table, with a built-in batch-twin equality check.
  * The multi-executor companion to ClusterSmoke: the specs pin the
  * streaming SEMANTICS in one JVM; this pins the EXECUTION REGIME —
  * state store partitions living on separate executor processes,
  * checkpoint/offset commits over the shared filesystem, the file
  * source's listing path — and emits a checksum so a spark:// run can
  * be diffed against a local[n] run. NOT part of the library surface.
  *
  * Shape: the events table is re-written as K time-range input files
  * (all rows in file k precede file k+1), appended one per micro-batch
  * — so cross-batch arrival order matches event-time order and the
  * stream/batch session parity is exact by construction (the spec's
  * disorder caveat does not trigger). Two far-future SENTINEL events
  * (user_id = -1) then advance the watermark and fire the event-time
  * timeouts: the first moves the watermark past every real session's
  * last+gap, the second triggers the batch in which those timeouts
  * actually fire (timeouts are evaluated against the PREVIOUS batch's
  * watermark). Every real session therefore closes and is emitted to
  * the parquet sink; the sentinel's own session never closes and its
  * user never reaches the output.
  */
object StreamSmoke {

  private val GapSecs = 1800L

  def main(args: Array[String]): Unit = {
    // batch-size knobs (r19): the r18 throughput doctrine ("micro-
    // batch cost is constant-dominated — size batches to amortize
    // the trigger constant") was inferred from ONE point; these let
    // the throughput run MEASURE rows/s against per-batch input.
    // SPARK_GRAFT_SLICES controls how many time-range input files
    // the corpus becomes; SPARK_GRAFT_MAXFILES is both the source's
    // maxFilesPerTrigger and the append stride (slices land in
    // chunks of this size, in time order, so each drain is ~one
    // batch of that many files and event-time order across batches
    // is preserved — the parity construction is unchanged).
    val InputFiles =
      sys.env.getOrElse("SPARK_GRAFT_SLICES", "6").toInt
    val maxFiles =
      sys.env.getOrElse("SPARK_GRAFT_MAXFILES", "1").toInt
    require(InputFiles >= 2 && maxFiles >= 1,
      s"need >=2 slices (got $InputFiles) and >=1 maxFiles ($maxFiles)")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val work = if (args.length > 1) args(1) else "/tmp/graft_streamsmoke"
    val spark = Sessions
      .clusterBuilder(
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16").toInt,
        "graft-stream-smoke")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // fresh work dirs per run (the checkpoint must not resume a
    // previous run's offsets, or the batch count diverges)
    def rmrf(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(rmrf)
      p.delete(): Unit
    }
    // refuse to wipe a directory that is not a previous run's work dir
    // — a mistyped second CLI arg (e.g. a data directory) must fail
    // loudly, not be silently destroyed before the run starts. The
    // check is a marker FILE this tool itself writes (`.stream-smoke`)
    // — an input/ or ckpt/ subdirectory is not proof of ownership (an
    // unrelated dataset could carry those names), the marker is.
    val workDir = new java.io.File(work)
    if (workDir.exists()) {
      val looksLikeOurs = work.contains("streamsmoke") ||
        new java.io.File(workDir, ".stream-smoke").isFile
      require(looksLikeOurs, s"refusing to delete '$work': not a prior " +
        "stream-smoke work dir (no .stream-smoke marker file and the " +
        "path does not contain 'streamsmoke')")
    }
    rmrf(workDir)
    val (inDir, outDir, ckptDir) =
      (s"$work/input", s"$work/out", s"$work/ckpt")
    Files.createDirectories(Paths.get(inDir))
    Files.createFile(Paths.get(work, ".stream-smoke")): Unit

    // events table: raw frame (Tables.events normalizes ts to LONG
    // nanos — what the batch sessionize's tsSecs expects) + typed
    // stream view (ts cast to timestamp; getTime/1000 floors to the
    // same seconds as the batch's `div 1e9`)
    val rawEv = graft.Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as("user_id"),
        col("ts"), col("value").cast("double").as("value"))
      .cache()
    val ev = rawEv
      .select(col("user_id"),
        (col("ts") / lit(1000000000L)).cast("timestamp").as("ts"),
        col("value"))
      .as[SessionEvent]
    val (minS, maxS) = ev.agg(
      min(unix_timestamp(col("ts"))), max(unix_timestamp(col("ts"))))
      .as[(Long, Long)].head()

    // K contiguous time-range slices, written as input-file payloads
    // up front (appended to the watched dir one at a time below)
    val step = math.max(1L, (maxS - minS) / InputFiles + 1)
    val slices = (0 until InputFiles).map { k =>
      val lo = minS + k * step
      val hi = lo + step
      s"$work/slice_$k" -> ev.where(
        unix_timestamp(col("ts")) >= lo && unix_timestamp(col("ts")) < hi)
    }
    slices.foreach { case (p, df) =>
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(p)
    }
    def appendSlice(src: String): Unit = {
      val files = new java.io.File(src).listFiles
        .filter(_.getName.endsWith(".parquet"))
      files.foreach { f =>
        Files.copy(f.toPath,
          Paths.get(inDir, s"${f.getParentFile.getName}_${f.getName}")): Unit
      }
    }
    def appendSentinel(name: String, secs: Long): Unit =
      Seq((-1L, new java.sql.Timestamp(secs * 1000L), 0.0))
        .toDF("user_id", "ts", "value").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$work/$name")

    // throughput telemetry (r18): the smoke has always verified
    // PARITY; this records RATE — per-micro-batch input rows and
    // trigger wall from the progress stream, so the JSON can report
    // sustained rows/s through the full stateful path (file source →
    // flatMapGroupsWithState state store → parquet sink commit) and
    // the batch-latency distribution, not just a final checksum.
    val batchStats =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          val p = e.progress
          val trig = Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(0L)
          if (p.numInputRows > 0)
            batchStats.add((p.numInputRows, trig)): Unit
        }
      })

    def startQueryWith(mf: Int) = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", mf.toString)
        .parquet(inDir)
        .as[SessionEvent]
      StreamingAggs.sessionizeStream(stream, GapSecs)
        .writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode(OutputMode.Append())
        .start()
    }
    def startQuery() = startQueryWith(maxFiles)
    // optional third arg:
    //  - "restart": STOP the query mid-corpus and start a FRESH one
    //    from the same checkpoint — the production recovery path
    //    (offset log + state store restore) exercised on whatever
    //    master this runs under.
    //  - "kill" (r17, needs SPARK_GRAFT_KILL_PID=<worker jvm pid>):
    //    SIGKILL one WORKER mid-corpus without touching the driver or
    //    the query — the executor-loss path. In-flight tasks retry on
    //    the surviving executor, and the state store provider reloads
    //    every partition's session state from the checkpoint delta
    //    files; no state may be lost or double-emitted.
    // Either way the final output must be byte-for-byte the
    // uninterrupted run's (same checksum), because the checkpoint
    // carries both the processed-file offsets and every open
    // session's state across the process/executor boundary.
    //  - "killmid" (r18, same env): SIGKILL the worker DURING the
    //    middle slice's micro-batch — a SparkListener armed just
    //    before that slice fires the kill on the Nth task START
    //    (SPARK_GRAFT_KILL_AFTER_TASKS, default 8 — inside the 16-task
    //    state-store stage), so the executor dies while a batch is
    //    actively updating state, not between batches. The output's
    //    "kill_mid_batch" field records query.status.isTriggerActive
    //    at kill time — the claim is checkable, not asserted.
    //  - "advise" (r20): the batch-size advisor loop, shipped from
    //    the r19 throughput curve's doctrine. Calibrates the trigger
    //    model batchWall = C + r·rows from its own progress telemetry
    //    (6 batches at stride 1, then 3 at stride 4 — two DISTINCT
    //    sizes far enough apart to clear the per-batch jitter floor,
    //    each phase's first batch discarded as warm-up), derives the
    //    maxFilesPerTrigger that puts per-batch row work at the
    //    curve's knee (BatchSize.rowsPerTrigger), RESTARTS the query
    //    from the same checkpoint with the recommendation applied
    //    (maxFilesPerTrigger is a source option, read at start — the
    //    production re-size path), and reports predicted vs achieved
    //    rows/s for the recommended phase. Parity check unchanged —
    //    the full corpus still flows through. Needs >=9 slices (run
    //    with SPARK_GRAFT_SLICES=12).
    val mode = if (args.length > 2) args(2) else "plain"
    require(Set("plain", "restart", "kill", "killmid", "advise")(mode),
      s"unknown mode '$mode'")
    val killPid = sys.env.get("SPARK_GRAFT_KILL_PID").map(_.trim.toLong)
    val killModes = Set("kill", "killmid")
    if (killModes(mode)) require(killPid.isDefined,
      s"$mode mode needs SPARK_GRAFT_KILL_PID=<worker jvm pid>")
    var query: org.apache.spark.sql.streaming.StreamingQuery = null
    def sigkillWorker(why: String): Unit = {
      System.err.println(s"[stream-smoke] KILL: SIGKILL worker pid " +
        s"${killPid.get} (+ child executors) $why")
      // kill the worker's executor CHILDREN too — a bare worker
      // SIGKILL orphans them still serving tasks
      new ProcessBuilder("bash", "-c",
        s"pkill -9 -P ${killPid.get}; kill -9 ${killPid.get}")
        .start().waitFor(): Unit
    }
    // mid-batch trigger: counts task STARTS once armed; the kill fires
    // from the listener-bus thread while the batch's tasks are running
    val killMidArmed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val killMidDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var killedMidBatch = false
    val killAfterTasks =
      sys.env.get("SPARK_GRAFT_KILL_AFTER_TASKS").map(_.trim.toInt)
        .getOrElse(8)
    if (mode == "killmid") {
      val started = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskStart(
              t: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
            if (killMidArmed.get() &&
                started.incrementAndGet() == killAfterTasks &&
                killMidDone.compareAndSet(false, true)) {
              killedMidBatch = query != null && query.status.isTriggerActive
              sigkillWorker(s"on task-start #$killAfterTasks (mid-batch; " +
                s"triggerActive=$killedMidBatch)")
            }
        })
    }
    // a kill needs a SURVIVOR: if the targeted worker hosts the only
    // executor, the post-kill drain can never finish (standalone
    // masters re-register nothing on this box) — fail fast instead
    def requireSurvivor(): Unit = {
      val n = spark.sparkContext.statusTracker.getExecutorInfos.length
      require(n > 2, // getExecutorInfos includes the driver
        s"$mode mode needs >1 executor so a survivor can take over " +
          s"(saw ${n - 1}); start a second worker before killing")
    }
    // post-kill drains are BOUNDED: a hung recovery (e.g. no surviving
    // executor after all) must report a timed-out verdict, not hang
    // the harness indefinitely
    @volatile var killFired = false
    def drain(): Unit =
      if (!killFired) query.processAllAvailable()
      else {
        import scala.concurrent.{Await, Future, TimeoutException}
        import scala.concurrent.duration._
        import scala.concurrent.ExecutionContext.Implicits.global
        val q = query
        try Await.result(Future(q.processAllAvailable()), 10.minutes)
        catch {
          case _: TimeoutException =>
            println(s"""{"metric":"stream_smoke","mode":"$mode","verdict":"post-kill drain timed out after 600s"}""")
            sys.exit(2)
        }
      }
    // advisor telemetry helpers: progress events are delivered on the
    // streams listener bus asynchronously, so phase snapshots wait for
    // the batch count to settle before reading
    def statsNow(): Seq[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      batchStats.asScala.toSeq
    }
    def settledStats(): Seq[(Long, Long)] = {
      var prev = -1
      var cur = statsNow().size
      while (cur != prev) {
        Thread.sleep(200); prev = cur; cur = statsNow().size
      }
      statsNow()
    }
    var advisorField = ""

    if (mode == "advise") {
      require(InputFiles >= 20, s"advise mode needs >=20 slices (6 " +
        s"calibration batches at stride 1, 3 at stride 4, >=2 slices " +
        s"to apply the recommendation); got $InputFiles — run with " +
        "SPARK_GRAFT_SLICES=24")
      // phase 1: six 1-file batches
      query = startQueryWith(1)
      slices.take(6).foreach { case (p, _) => appendSlice(p); drain() }
      query.stop()
      val s1 = settledStats()
      // phase 2: three 4-file batches. Stride 4, not 2: the first
      // advise run measured 1-vs-2-file walls INSIDE the per-batch
      // noise floor (~±100 ms of state-store/GC jitter on a ~650 ms
      // batch) — the second size must move row work by enough to
      // clear it. Still a second DISTINCT size (the r18 one-point
      // trap).
      // drain per 4-slice chunk, like the plain flow: appending all
      // 12 at once gives same-millisecond modTimes, the file source
      // tie-breaks by PATH (slice_10 < slice_6 lexicographically),
      // and cross-BATCH time order breaks — below-watermark batches
      // are exactly the disorder the parity construction excludes
      query = startQueryWith(4)
      slices.slice(6, 18).grouped(4).foreach { chunk =>
        chunk.foreach { case (p, _) => appendSlice(p) }
        drain()
      }
      query.stop()
      val s2 = settledStats().drop(s1.size)
      // each phase's FIRST batch is discarded from the fit, the
      // repo-wide warm-up doctrine: a fresh query's first batch pays
      // JIT/codegen (measured 2.0 s vs 0.65 s steady) and a
      // restarted query's first batch pays the state-store reload —
      // neither is the marginal cost being fitted
      val fitted = graft.streaming.BatchSize.fit(s1.drop(1) ++ s2.drop(1))
      val rowsPerFile =
        math.max(1L, s1.map(_._1).sum / math.max(1, s1.size))
      val remaining = InputFiles - 18
      val (recRaw, fitJson) = fitted match {
        case Some((cFit, rFit)) =>
          val targetRows =
            graft.streaming.BatchSize.rowsPerTrigger(cFit, rFit)
          def fd(d: Double) =
            String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
          (graft.streaming.BatchSize.maxFilesFor(targetRows, rowsPerFile),
            s""""fit_constant_ms":${fd(cFit * 1000)},""" +
            s""""fit_us_per_row":${fd(rFit * 1e6)},""" +
            s""""target_rows":$targetRows,""" +
            s""""predicted_rows_per_sec":${fd(graft.streaming.BatchSize
              .predictedRowsPerSec(cFit, rFit,
                rowsPerFile * math.min(
                  graft.streaming.BatchSize
                    .maxFilesFor(targetRows, rowsPerFile),
                  remaining)))},""")
        case None =>
          // a FLAT curve is information, not an error: row work never
          // reached the trigger constant across the measured sizes,
          // so every measured batch is constant-dominated and the
          // doctrine says keep growing — recommend the recovery-unit
          // cap (here: whatever one drain can absorb)
          (64, s""""fit_constant_ms":null,"fit_us_per_row":null,""" +
            s""""flat_curve":true,""")
      }
      val rec = math.max(1, math.min(recRaw, remaining))
      System.err.println(s"[stream-smoke] advisor: " +
        s"rec maxFiles=$rec (raw $recRaw, $remaining slices left); " +
        s"calib p1=${s1.mkString(",")} p2=${s2.mkString(",")}")
      // phase 3: the recommendation applied via checkpoint restart
      // (maxFilesPerTrigger is a source option, read at query start —
      // this IS the production re-size path)
      val before = settledStats().size
      query = startQueryWith(rec)
      slices.drop(18).grouped(rec).foreach { chunk =>
        chunk.foreach { case (p, _) => appendSlice(p) }
        drain()
      }
      val s3 = settledStats().drop(before)
      // sentinels AFTER the phase-3 snapshot: their 1-row batches
      // close the sessions but must not dilute the measured rate
      appendSentinel("sent1", maxS + 2L * 86400)
      appendSlice(s"$work/sent1")
      drain()
      appendSentinel("sent2", maxS + 4L * 86400)
      appendSlice(s"$work/sent2")
      drain()
      query.stop()
      val rows3 = s3.map(_._1).sum
      val busy3 = s3.map(_._2).sum
      val achieved = if (busy3 > 0) rows3 * 1000.0 / busy3 else 0.0
      def fr(d: Double) =
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(d))
      advisorField =
        s""","advisor":{$fitJson""" +
        s""""rows_per_file":$rowsPerFile,""" +
        s""""recommended_files":$recRaw,"applied_files":$rec,""" +
        s""""phase3_batches":${s3.size},""" +
        s""""achieved_rows_per_sec":${fr(achieved)}}"""
    } else {

    query = startQuery()
    // slices land in chunks of maxFiles (1 = the historical shape):
    // appended in time order, drained per chunk, so the file source
    // groups exactly one chunk per micro-batch and cross-batch
    // arrival order still matches event-time order
    val midSlice = InputFiles / 2
    slices.grouped(maxFiles).foreach { chunk =>
      val ks = chunk.map { case (p, _) =>
        slices.indexWhere(_._1 == p) }
      // injection modes split the chunk AT the mid slice: with
      // maxFiles > 1 the fault would otherwise fire before the whole
      // chunk, i.e. up to maxFiles-1 slices earlier than the logged
      // "before slice N" point. Pre-mid slices are appended and
      // drained first so the fault lands exactly at the claimed input
      // fraction. Plain mode never splits — its chunking is the
      // throughput measurement's batch size and must stay untouched.
      val inject = mode != "plain" && ks.contains(midSlice)
      if (inject) {
        val (pre, rest) = chunk.splitAt(ks.indexOf(midSlice))
        if (pre.nonEmpty) {
          pre.foreach { case (p, _) => appendSlice(p) }
          drain()
        }
        mode match {
          case "restart" =>
            query.stop()
            query = startQuery()
          case "kill" =>
            requireSurvivor()
            sigkillWorker(s"before slice $midSlice")
            killFired = true
          case _ => // killmid
            requireSurvivor()
            killMidArmed.set(true)
            killFired = true
        }
        rest.foreach { case (p, _) => appendSlice(p) }
        drain()
      } else {
        chunk.foreach { case (p, _) => appendSlice(p) }
        drain()
      }
    }
    // sentinel 1 advances the watermark past every last+gap; sentinel
    // 2 triggers the batch in which those timeouts fire
    appendSentinel("sent1", maxS + 2L * 86400)
    appendSlice(s"$work/sent1")
    drain()
    appendSentinel("sent2", maxS + 4L * 86400)
    appendSlice(s"$work/sent2")
    drain()
    query.stop()
    } // end non-advise flow
    if (mode == "killmid") require(killMidDone.get(),
      s"killmid armed but the task-start trigger never fired " +
        s"(killAfterTasks=$killAfterTasks too high for this batch?)")

    // parity compare: MULTISETS keyed on the exact integer fields
    // (user_id, n_events, duration_secs), sum_value under a small
    // tolerance — the stream sums per-event in arrival order while
    // the batch twin sums in Spark's partial-aggregation order, so a
    // session sum carries float jitter: it can neither be compared
    // exactly nor used as a SORT key for a positional zip (two
    // sessions sharing (u,n,d) could order differently per side on
    // jittered sums). Grouping by (u,n,d) and zipping each group's
    // sorted sums with tolerance is order-flip-proof: a flip needs
    // |a-b| < jitter << tolerance, so the crossed compare still passes.
    def pull(rows: Dataset[_]) = rows
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast("double").as("sv"), col("duration_secs"))
      .as[(Long, Long, Double, Long)].collect().toSeq
    val streamed = pull(
      spark.read.parquet(outDir).where(col("user_id") >= 0))
    val batch = pull(
      Events.sessionize(rawEv.withColumn("event_id", lit(0L)), GapSecs))
    def grouped(rows: Seq[(Long, Long, Double, Long)]) =
      rows.groupBy { case (u, n, _, d) => (u, n, d) }
        .view.mapValues(_.map(_._3).sorted).toMap
    val (sg, bg) = (grouped(streamed), grouped(batch))
    val matches = streamed.size == batch.size && sg.keySet == bg.keySet &&
      sg.forall { case (k, svs) =>
        val o = bg(k)
        svs.size == o.size && svs.zip(o).forall { case (a, b) =>
          math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(a)) }
      }
    // checksum keeps the r16 formula (HALF_UP 2dp, as round() emitted)
    // so cross-master / restart-parity checksums stay comparable
    val checksum = streamed.map { case (u, n, sv, d) =>
      val r = BigDecimal(sv)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      java.util.Objects.hash(Long.box(u), Long.box(n),
        Double.box(r), Long.box(d)).toLong
    }.sum
    val master = spark.sparkContext.master
    val execs = spark.sparkContext.statusTracker.getExecutorInfos.length
    val midField =
      if (mode == "killmid") s""","kill_mid_batch":$killedMidBatch""" else ""
    // rate report: input rows vs summed trigger wall (busy time, not
    // harness wall — the appendSlice/drain choreography idles between
    // batches by design), plus the batch-latency distribution
    val stats = {
      import scala.jdk.CollectionConverters._
      batchStats.asScala.toSeq
    }
    // plain mode only: restart/kill modes REPLAY micro-batches after
    // recovery, and the progress listener counts the replays again —
    // an inflated rate that must never be compared against a
    // plain-mode baseline (ADVICE r18)
    val rateField = if (mode == "plain" && stats.nonEmpty) {
      val rows = stats.map(_._1).sum
      val busyMs = stats.map(_._2).sum
      val lat = stats.map(_._2).sorted
      def pct(q: Double) =
        lat((q * (lat.size - 1)).round.toInt)
      val rps = if (busyMs > 0) rows * 1000L / busyMs else 0L
      s""","throughput":{"batches":${stats.size},"max_files_per_trigger":$maxFiles,"slices":$InputFiles,"input_rows":$rows,"busy_secs":${busyMs / 1000.0},"rows_per_sec":$rps,"p50_batch_ms":${pct(0.5)},"p95_batch_ms":${pct(0.95)},"max_batch_ms":${lat.last}}"""
    } else ""
    println(s"""{"metric":"stream_smoke","master":"$master","executors":$execs,"sf":"$sfDir","mode":"$mode","sessions":${streamed.size},"batch_sessions":${batch.size},"batch_match":$matches$midField$rateField$advisorField,"checksum":$checksum}""")
    if (!matches) {
      System.err.println(s"[stream-smoke] MISMATCH: streamed=" +
        s"${streamed.size} batch=${batch.size}; first key diffs: " +
        ((sg.keySet -- bg.keySet).take(3), (bg.keySet -- sg.keySet).take(3)))
      sys.exit(1)
    }
    spark.stop()
  }
}
