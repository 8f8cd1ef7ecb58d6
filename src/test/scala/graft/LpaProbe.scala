package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** Probe (r19): labelPropagation's size-attach shapes under a MEGA
  * community — the regime the window default documents as its bound.
  *
  * Graph: a star (hub 0, N leaves) plus N/10 disjoint pair edges as
  * background communities. Under synchronous LPA the star's leaves
  * converge to ONE label (~N rows of it), so the size-attach step
  * sees one label holding ~half the (node,label) frame:
  *
  *  - sizeAttach="window": the by-label exchange lands every mega-
  *    community row in ONE partition and WindowExec buffers it in a
  *    single task — the documented un-splittable straggler (AQE
  *    skew-splits joins, not windows);
  *  - sizeAttach="join": groupBy(label).count collapses map-side to
  *    one row per label per mapper, and the unhinted join back is
  *    either AQE-broadcast (sizes frame measured-small, as here) or
  *    an AQE-splittable sort-merge — no single task ever holds the
  *    mega community.
  *
  * Witnesses: wall + MAX-TASK duration per path (the straggler
  * itself, behind a listener-bus flush), and checksum equality
  * between the two paths (they must be the same operator).
  * Not part of the API; run with Test/runMain graft.LpaProbe.
  */
object LpaProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(8000000L)
    // 2 sync iterations suffice to form the mega label; fewer iters =
    // less loop wall diluting the size-attach delta being measured
    val iters = if (args.length > 1) args(1).toInt else 2
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val maxTaskMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null)
          maxTaskMs.getAndAccumulate(t.taskInfo.duration, math.max)
    })
    def flushBus(): Unit = org.apache.spark.sql.graftshim
      .ListenerBusShim.flush(spark.sparkContext): Unit

    // star: leaves 1..n ↔ hub 0; background: disjoint pairs far above
    // the star's id range so the communities never merge
    val star = spark.range(1L, n + 1L)
      .select(col("id").as("a"), lit(0L).as("b"))
    val pairs = spark.range(0L, n / 10L)
      .select((col("id") * 2 + 10 * n).as("a"),
        (col("id") * 2 + 10 * n + 1).as("b"))
    val edges = star.unionAll(pairs)
    edges.write.mode("overwrite").parquet("/tmp/lpa_probe_edges")
    val e = spark.read.parquet("/tmp/lpa_probe_edges")

    var sums = Map.empty[String, String]
    def run(tag: String, sizeAttach: String): Double = {
      flushBus()
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val df = Stats.labelPropagation(e, "a", "b",
        maxIters = iters, sizeAttach = sizeAttach)
      val row = df.agg(sum(xxhash64(df.columns.sorted.map(col): _*)
        .cast("decimal(38,0)"))).collect().head
      val secs = (System.nanoTime() - t0) / 1e9
      val cs = if (row.isNullAt(0)) "null" else row.get(0).toString
      sums.get("lpa").foreach(prev => require(prev == cs,
        s"LPAPROBE checksum mismatch at $tag: $prev vs $cs"))
      sums += "lpa" -> cs
      flushBus()
      println(f"LPAPROBE $tag wall=$secs%.2f s " +
        f"max_task=${maxTaskMs.get() / 1e3}%.1f s")
      spark.catalog.clearCache()
      System.gc()
      secs
    }

    run("warmup window", "window")
    val w = (1 to 3).map(i => run(s"window $i", "window")).min
    run("warmup join", "join")
    val j = (1 to 3).map(i => run(s"join $i", "join")).min
    println(f"LPAPROBE n=$n min_window=$w%.2f min_join=$j%.2f " +
      f"ratio=${w / j}%.2f (checksums identical)")

    // auto-mode regime assertion (r20): the data-derived pick must
    // choose join on THIS graph (the star's mega community crosses
    // the 1 M-row default threshold) and window on the panel-sized
    // clique-bridge graph — same checksum either way (run() enforces
    // it for the star via the shared key)
    def usesWindow(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case wd: org.apache.spark.sql.catalyst.plans.logical.Window => wd
      }.nonEmpty
    run("auto (star)", "auto")
    val autoStar = Stats.labelPropagation(e, "a", "b",
      maxIters = iters, sizeAttach = "auto")
    require(!usesWindow(autoStar),
      "auto must pick the join path on the mega-community star")
    val cliques = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .map { case (a, b) => (a, b) }
    import spark.implicits._
    val autoClique = Stats.labelPropagation(
      cliques.toDF("a", "b"), "a", "b", sizeAttach = "auto")
    require(usesWindow(autoClique),
      "auto must pick the window path on the clique-bridge graph")
    println("LPAPROBE auto: join on the star, window on the " +
      "clique-bridge (plan-asserted)")
    spark.stop()
  }
}
