package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: Skew.saltedJoin / AQE skew-split under a REAL hot key.
  * Builds a 20 M-row fact from sf1 events with a configurable share
  * of rows remapped to one user, joins a ~100 k-row per-user dim
  * (too large to broadcast by scenario — broadcast disabled, the
  * 100 TB dim regime), and measures plain vs salted (32 buckets)
  * wall. Not part of the API.
  *
  * v2 (r18) — the r13 run compared aqe_off vs aqe_on and concluded
  * AQE's skew-join splitting "did not close the gap"; that run left
  * `skewedPartitionThresholdInBytes` at its 256 MB default while the
  * probe's hot partition is only ~100-150 MB post-shuffle, so AQE
  * never CLASSIFIED the partition as skewed — the conclusion was a
  * threshold artifact of the probe SF, not a property of the shape.
  * At lake scale a hot key's partition dwarfs 256 MB and the default
  * config fires. v2 adds:
  *   - an `aqe_tuned` regime with the trigger scaled to the probe SF
  *     (threshold 16 MB, factor 2, advisory 16 MB) — what the DEFAULT
  *     config does to a lake-scale hot key;
  *   - a MAX-TASK witness per measurement (TaskEnd listener): the
  *     straggler itself, which mitigation must shrink — wall alone
  *     can hide a straggler behind parallel siblings;
  *   - checksum parity REQUIRED across all regimes and variants;
  *   - the aggregation scenario: plain groupBy(hot).agg(count,sum)
  *     vs Skew.saltedCountSum — expected parity (map-side partial
  *     aggregation already absorbs algebraic-agg skew), bounding
  *     where the extra salting shuffle is worth paying.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.scaleprobe/sf1")
    // hot-key share in tenths: 3 => 30% of fact rows on user 42
    val hotTenths = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // many MAP tasks on the fact scan (~64 at this SF, see the
      // repartition(64) write below): AQE's skew split operates on
      // contiguous MAP-INDEX ranges of the hot reduce partition, so
      // its split granularity is bounded by mapper count — with the
      // default 128 MB bin-packing this probe's 24 MB fact collapses
      // to ONE mapper and a skewed partition becomes UNSPLITTABLE
      // (the rule silently no-ops; r13 hit this without noticing).
      // At lake scale a hot key arrives from thousands of mappers;
      // 8 MB bins model that regime at probe SF.
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Skew

    // straggler witness: longest single task of the current measurement
    val maxTaskMs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null)
          maxTaskMs.getAndAccumulate(t.taskInfo.duration, math.max)
    })

    // 20M-row fact: sf1 events ×20, hotTenths/10 of rows on hot user 42
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("value"))
    val fact = ev
      .withColumn("rep", explode(sequence(lit(0), lit(19))))
      .withColumn("user_id",
        when(pmod(col("event_id") * 20 + col("rep"), lit(10)) < hotTenths, lit(42L))
          .otherwise(col("user_id")))
      .select(col("user_id"), col("value"))
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("segment", concat(lit("seg_"), pmod(col("user_id"), lit(7))))
    fact.repartition(64).write.mode("overwrite").parquet("/tmp/skew_fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    // dvalue: the summed measure as DECIMAL — double sums are
    // order-dependent in their low bits, so the parity checksums
    // would spuriously differ between plain and salted row orders;
    // decimal addition is exact and order-free
    val f = spark.read.parquet("/tmp/skew_fact")
      .withColumn("dvalue", col("value").cast("decimal(18,3)"))
    val d = spark.read.parquet("/tmp/skew_dim")
    println(s"SKEWPROBE hotTenths=$hotTenths fact=${f.count()} dim=${d.count()} " +
      s"hot=${f.where(col("user_id") === 42).count()}")

    // the 100 TB dim regime: never broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // every timed consumption is ALSO the parity witness: identical
    // rows → identical sum-of-row-hashes across regimes and variants
    var sums = Map.empty[String, String]
    // the last measurement's materialized agg frame + skew verdict,
    // for the advisor regime below (reads mapStats off the executed
    // adaptive plan) and its assertions
    var lastAgg: DataFrame = null
    var lastSplit = false
    // TaskEnd delivery is async on the listener bus: reset/read the
    // straggler witness only behind a bounded bus flush, or the
    // straggler's own event (the one the witness exists to capture)
    // can arrive after the read — or after the NEXT measurement's
    // reset (r18 ran without this; ADVICE item)
    def flushBus(): Unit = org.apache.spark.sql.graftshim
      .ListenerBusShim.flush(spark.sparkContext): Unit
    def timeIt(tag: String, parityKey: String)(mk: => DataFrame): Double = {
      flushBus()
      maxTaskMs.set(0)
      val t0 = System.nanoTime()
      val df = mk
      val agg = df.agg(sum(xxhash64(df.columns.sorted.map(col): _*)
        .cast("decimal(38,0)")))
      val row = agg.collect().head
      val secs = (System.nanoTime() - t0) / 1e9
      val cs = if (row.isNullAt(0)) "null" else row.get(0).toString
      sums.get(parityKey).foreach(prev => require(prev == cs,
        s"checksum mismatch for $parityKey at $tag: $prev vs $cs"))
      sums += parityKey -> cs
      // did AQE actually CLASSIFY a partition as skewed? The final
      // adaptive plan marks the join `skew=true` — without this
      // witness, "AQE didn't help" is indistinguishable from "AQE
      // never fired" (the r13 conclusion's failure mode)
      val split = agg.queryExecution.executedPlan.toString.contains("skew=true")
      lastAgg = agg
      lastSplit = split
      flushBus()
      println(f"SKEWPROBE $tag wall=$secs%.2f s " +
        f"max_task=${maxTaskMs.get() / 1e3}%.1f s skew_split=$split")
      secs
    }
    def joinOut(j: DataFrame): DataFrame =
      j.groupBy(col("segment"))
        .agg(sum(col("dvalue")).cast("decimal(38,3)").as("sv"),
          count(lit(1)).as("cnt"))
    def sweep(regime: String): Unit = {
      timeIt(s"$regime warmup", "join")(joinOut(f.join(d, Seq("user_id"))))
      val plainW = (1 to 3).map(_ =>
        timeIt(s"$regime plain", "join")(
          joinOut(f.join(d, Seq("user_id"))))).min
      val saltW = (1 to 3).map(_ => timeIt(s"$regime salted", "join")(
        joinOut(Skew.saltedJoin(f, d, "user_id", col("value") * 1e6, 32)))).min
      println(f"SKEWPROBE $regime min_plain=$plainW%.2f " +
        f"min_salted=$saltW%.2f ratio=${plainW / saltW}%.2f")
    }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sweep("aqe_off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // r13's regime: defaults — the 256 MB trigger never fires at this SF
    sweep("aqe_default")
    // trigger scaled to the probe SF: what defaults do at lake scale
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    sweep("aqe_tuned")

    // r19: the SHIPPED advisor closes the loop the aqe_tuned regime
    // tuned BY HAND — defaults silently no-op, SkewAdvisor reads the
    // materialized plan's per-partition compressed bytes and mapper
    // counts (the exact inputs AQE's classifier compares), and its
    // recommended confs make the split FIRE on the re-run. Asserted,
    // not just printed.
    import graft.operators.SkewAdvisor
    val skewConfs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    skewConfs.foreach(spark.conf.unset)
    timeIt("aqe_advised defaults", "join")(joinOut(f.join(d, Seq("user_id"))))
    require(!lastSplit, "SKEWPROBE: defaults split at probe SF — the " +
      "silent-no-op regime the advisor exists for no longer reproduces")
    val rec = SkewAdvisor.recommend(lastAgg)
    println(s"SKEWPROBE advisor: ${rec.note}")
    rec.profiles.foreach(p => println(
      s"SKEWPROBE advisor shuffle=${p.shuffleId} mappers=${p.numMappers} " +
        s"parts=${p.numPartitions} max=${p.maxBytes} med=${p.medianBytes} " +
        f"ratio=${p.skewRatio}%.1f splittable=${p.splittable}"))
    require(rec.thresholdBytes.isDefined,
      "SKEWPROBE: advisor found no skewed splittable shuffle in a " +
        "probe BUILT around one")
    spark.conf.set(skewConfs(0), rec.thresholdBytes.get.toString)
    spark.conf.set(skewConfs(2), rec.advisoryBytes.get.toString)
    val advisedW = (1 to 3).map(_ => timeIt("aqe_advised plain", "join")(
      joinOut(f.join(d, Seq("user_id"))))).min
    require(lastSplit,
      "SKEWPROBE: advisor-recommended threshold did not fire skew_split")
    println(f"SKEWPROBE aqe_advised min_plain=$advisedW%.2f " +
      s"(threshold=${rec.thresholdBytes.get} " +
      s"advisory=${rec.advisoryBytes.get}, skew_split asserted)")
    skewConfs.foreach(spark.conf.unset)

    // aggregation path: partial aggregation vs explicit two-phase salt
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def norm(df: DataFrame) = df.select(col("user_id"),
      col("cnt").cast("long"),
      col("sum_value").cast("decimal(38,3)").as("sum_value"))
    def aggPlain() = norm(f.groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("dvalue")).as("sum_value")))
    def aggSalted() = norm(
      Skew.saltedCountSum(f, "user_id", "dvalue", col("value") * 1e6, 32))
    timeIt("agg warmup", "agg")(aggPlain())
    val aggP = (1 to 3).map(_ => timeIt("agg plain", "agg")(aggPlain())).min
    val aggS = (1 to 3).map(_ => timeIt("agg salted", "agg")(aggSalted())).min
    println(f"SKEWPROBE agg min_plain=$aggP%.2f min_salted=$aggS%.2f " +
      f"ratio=${aggP / aggS}%.2f")
    println("SKEWPROBE checksums identical across all regimes/variants")
  }
}
