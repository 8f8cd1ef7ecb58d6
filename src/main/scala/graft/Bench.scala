package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localBuilder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM / codegen / IO paths so per-query times reflect
    // steady state rather than first-job startup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // min of `Runs` timed executions per query (disclosed in the JSON,
    // along with EVERY run's raw time so regressions can be separated
    // from noise without a re-run): single-shot numbers on a shared
    // host mix real cost with co-tenant noise and one-time codegen/JIT
    // of each fresh plan; min-of-N is the standard way to report the
    // reproducible cost. Cache is cleared between runs so every run
    // recomputes from parquet.
    val Runs = 2
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        // checksum-aggregate EVERY output column (engine-local hash is
        // fine for a bench): a bare count() would let the optimizer
        // prune computed projections out of narrow per-doc queries and
        // bench little more than the parquet scan. The hash sums in
        // decimal(38,0) — summing raw longs overflows and ANSI mode
        // (Spark 4 default) turns that into a query-killing error.
        val ok = try {
          val df = fn(spark, sfDir)
          df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
            .collect()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators may cache() intermediates reused within their own
        // plan (e.g. dedup shingles); drop them between runs so every
        // run starts cold and sessions never accumulate stale blocks.
        // The explicit GC matters in a 49-query session: Spark's
        // ContextCleaner reclaims finished broadcasts/shuffles only
        // when their weak references are collected, and without a
        // nudge the accumulated state from earlier queries inflates
        // later queries' times (observed 3-6x on mid-suite queries).
        spark.catalog.clearCache()
        System.gc()
        (dt, ok)
      }
      // stderr progress (stdout stays the single-JSON-line driver
      // contract): long sweeps at larger SFs are otherwise opaque
      // min over SUCCESSFUL runs only — the stdout JSON reports null
      // for failed queries and the progress line must not let one
      // masquerade as fast either
      val okTimes = runs.filter(_._2).map(_._1)
      System.err.println(if (okTimes.isEmpty) s"[bench] $name FAILED"
      else String.format(java.util.Locale.ROOT,
        "[bench] %s %.2f s", name, Double.box(okTimes.min)))
      name -> runs
    }
    // a query that threw reports null (not its near-zero wall time) so
    // a broken query can never masquerade as a fast one. Locale.ROOT:
    // the f-interpolator uses the JVM default locale, which on a
    // comma-decimal locale would print 1,234567 — invalid JSON.
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    val qs = results.map { case (name, runs) =>
      val t = if (runs.forall(_._2)) fmt(runs.map(_._1).min) else "null"
      s"\"$name\":$t"
    }.mkString("{", ",", "}")
    val allRuns = results.map { case (name, runs) =>
      s"\"$name\":[${runs.map(r => if (r._2) fmt(r._1) else "null").mkString(",")}]"
    }.mkString("{", ",", "}")
    val failed = results.collect {
      case (name, runs) if runs.exists(!_._2) => s"\"$name\"" }
    val total = results.flatMap { case (_, runs) =>
      if (runs.forall(_._2)) Some(runs.map(_._1).min) else None }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$Runs,"agg":"min","run_times":$allRuns,"failed":[${failed.mkString(",")}]}"""
    println(json)
    // the driver captures a truncated log TAIL — two rounds running,
    // the leading queries' times were lost to truncation. The file is
    // the durable record; the stdout line stays the driver contract.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(s"[bench] json written to $outPath")
    spark.stop()
  }
}
