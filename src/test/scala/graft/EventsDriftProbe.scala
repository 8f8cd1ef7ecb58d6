package graft

import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** r20 drift adjudication (r19 verdict "What's wrong" item 1): the
  * events-family bench elevation — ev_transitions 0.60→0.88 s
  * (1.47×), ev_retention 1.36×, ev_windowed_agg 1.31×, ev_user_topk
  * 1.26×, ev_anomaly 1.23× across r18→r19 sweeps of UNTOUCHED code —
  * the only family-coherent movement of an otherwise 0.98-median
  * sweep. A whole-family move on one shared input table is the
  * box/testdata-regen signature under the repo's calibrated
  * criterion (testdata is regenerated per driver session, so the
  * events table's row mix differs run to run), but it was
  * unadjudicated. Method = the var-pair probe's:
  *
  *  - controls (untouched rows off the events table, plus one ON it)
  *    calibrate today's box+testdata against both committed sweeps;
  *  - each target gets a DEEP cleared-cache distribution (12 reps,
  *    Bench's exact protocol) — the reproducible floor and the
  *    run-to-run envelope;
  *  - the events table's row count + on-disk bytes are printed so a
  *    regen-driven input shift is checkable, not guessed.
  *
  * Reading: if today's floors sit at/below the r19 sweep values (and
  * the controls sit at their own committed values), the family move
  * is session noise inside the envelope — record re-flag thresholds.
  * If a target's floor reproduces ABOVE its r19 value while controls
  * hold, that's a real regression to bisect.
  *
  * Not part of the API; run with Test/runMain graft.EventsDriftProbe.
  */
object EventsDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val evRows = spark.read.parquet(s"$sfDir/events.parquet").count()
    println(s"EVENTS rows=$evRows " +
      s"bytes=${Sessions.localDataBytes(s"$sfDir/events.parquet")}")

    def fmt(ts: Seq[Double]) = ts.map(t =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
      .mkString(", ")
    def rep(name: String): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
        .collect()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }

    // controls: two heavyish rows that moved <5% r18→r19 (box
    // calibration) + one sub-second NON-events row (constant-cost
    // calibration at the same magnitude as the targets)
    val controls = Seq("q5_region_revenue", "dedup_minhash_lsh", "trend_daily")
    controls.foreach { name =>
      val ts = (1 to 5).map(_ => rep(name))
      println(f"CONTROL $name: ${fmt(ts)} (min ${ts.min}%.3f)")
    }

    val targets = Seq("ev_transitions", "ev_retention",
      "ev_windowed_agg", "ev_user_topk", "ev_anomaly")
    targets.foreach { name =>
      val ts = (1 to 12).map(_ => rep(name))
      println(f"TARGET $name cleared(12): ${fmt(ts)}")
      println(f"TARGET $name min=${ts.min}%.3f " +
        f"median=${ts.sorted.apply(ts.size / 2)}%.3f max=${ts.max}%.3f")
    }
    spark.stop()
  }
}
