package graft

import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** r19 drift adjudication (r18 verdict item 1): the paired
  * var_driver 1.29→2.80 s / var_summary 1.51→2.55 s sf0.1 moves —
  * the only non-uniform rows of the r18 sweep. Both share the
  * variant synth chain (VariantQueries.synth: a cached 400-row
  * distinct that is a plan barrier, filled by a full lineitem scan
  * per cleared-cache run), so this session tests the shared
  * cache-fill hypothesis the sc_grn r18 adjudication identified:
  *
  *  - controls (untouched rows) calibrate today's box against the
  *    r18-committed sweep (BENCH_LAST.json);
  *  - each target gets a DEEP cleared-cache distribution (12 reps,
  *    Bench's exact protocol: checksum action, clearCache + GC per
  *    rep) — the reproducible floor and the envelope;
  *  - then WARM reps (no clearCache): the delta cleared−warm is the
  *    cache-fill + ContextCleaner share of the wall;
  *  - then the CROSS-query warm pair: var_summary right after
  *    var_driver without clearing — CacheManager dedupes by
  *    canonicalized plan, so the second query should skip the
  *    lineitem scan entirely, pinning that the cache really is
  *    SHARED (the "paired movement" mechanism).
  *
  * Not part of the API; run with Test/runMain graft.VarDriftProbe.
  */
object VarDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def fmt(ts: Seq[Double]) = ts.map(t =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
      .mkString(", ")
    def rep(name: String, clear: Boolean): Double = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
        .collect()
      val dt = (System.nanoTime() - t0) / 1e9
      if (clear) { spark.catalog.clearCache(); System.gc() }
      dt
    }
    def cold(): Unit = { spark.catalog.clearCache(); System.gc() }

    val controls = Seq("q5_region_revenue", "dedup_minhash_lsh",
      "sc_qc", "deg_centrality", "driver_db")
    controls.foreach { name =>
      val ts = (1 to 3).map(_ => rep(name, clear = true))
      println(s"CONTROL $name: ${fmt(ts)} (min ${fmt(Seq(ts.min))})")
    }

    Seq("var_driver", "var_summary").foreach { name =>
      val cleared = (1 to 12).map(_ => rep(name, clear = true))
      println(s"TARGET $name cleared(12): ${fmt(cleared)}")
      println(f"TARGET $name cleared min=${cleared.min}%.3f " +
        f"median=${cleared.sorted.apply(6)}%.3f max=${cleared.max}%.3f")
      val warm = (1 to 6).map(_ => rep(name, clear = false))
      println(s"TARGET $name warm(6): ${fmt(warm)} " +
        f"(min ${warm.min}%.3f — cache-fill share " +
        f"~${100 * (1 - warm.min / cleared.min)}%.0f%% of cleared floor)")
      cold()
    }

    // cross-query warm pair: does var_summary reuse var_driver's
    // cached synth frame? (CacheManager canonical-plan dedup)
    cold()
    val dFill = rep("var_driver", clear = false)
    val sWarm = rep("var_summary", clear = false)
    cold()
    val sFill = rep("var_summary", clear = false)
    val dWarm = rep("var_driver", clear = false)
    cold()
    println(f"PAIR var_driver(fill)=$dFill%.3f then var_summary=$sWarm%.3f; " +
      f"var_summary(fill)=$sFill%.3f then var_driver=$dWarm%.3f")
    spark.stop()
  }
}
