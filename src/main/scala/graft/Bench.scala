package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localBuilder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // decade-scaled AQE initialPartitionNum (r19 sf30 doctrine, r20
    // application point): identical to the old partitions-=-cores pin
    // through sf10, wide-plan + AQE-coalesce above it.
    // SPARK_GRAFT_SHUFFLE pins raw partitions for rule probes.
    Sessions.applyShufflePartitions(spark, sfDir, cpus.toInt): Unit
    // opt-in reliable checkpointing (connectedComponents switches
    // from localCheckpoint blocks to per-round files when set) — the
    // memory-pressure knob for heap-bound scale probes
    sys.env.get("SPARK_GRAFT_CKPT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    // warm up the JVM / codegen / IO paths so per-query times reflect
    // steady state rather than first-job startup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // per query: ONE DISCARDED warm-up execution, then min of `Runs`
    // timed executions (disclosed in the JSON, along with EVERY run's
    // raw time so regressions can be separated from noise without a
    // re-run). The discarded warm-up pays each fresh plan's one-time
    // codegen + C2-JIT cost outside the timed window — without it the
    // heavy array-join verifiers swung 18-59 s at sf1 across sweeps of
    // identical code (first-run-in-JVM ~2-2.5× the warm cost), making
    // round-over-round regression detection blunt. min-of-N over the
    // warm runs is the standard way to report the reproducible cost.
    // Cache is cleared between ALL runs so every run recomputes from
    // parquet — warm-up warms the JVM, never the data.
    val Runs = 2
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (0 to Runs).map { _ =>
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
      // min over SUCCESSFUL TIMED runs only (runs.head is the
      // discarded warm-up) — the stdout JSON reports null for failed
      // queries and the progress line must not let one masquerade as
      // fast either
      val okTimes = runs.drop(1).filter(_._2).map(_._1)
      System.err.println(if (okTimes.isEmpty) s"[bench] $name FAILED"
      else String.format(java.util.Locale.ROOT,
        "[bench] %s %.2f s (warmup %.2f)", name,
        Double.box(okTimes.min), Double.box(runs.head._1)))
      name -> runs
    }
    // a query that threw reports null (not its near-zero wall time) so
    // a broken query can never masquerade as a fast one. Locale.ROOT:
    // the f-interpolator uses the JVM default locale, which on a
    // comma-decimal locale would print 1,234567 — invalid JSON.
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    def fmt3(d: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // headline per-query time = min over the TIMED runs (warm-up at
    // index 0 discarded); warm-up raw times are disclosed separately
    // so JIT-regime analysis never needs a re-run
    val mins: Seq[(String, Option[Double])] = results.map {
      case (name, runs) =>
        val timed = runs.drop(1)
        name -> (if (timed.forall(_._2)) Some(timed.map(_._1).min) else None)
    }
    val qs = mins.map { case (name, t) =>
      s"\"$name\":${t.map(fmt).getOrElse("null")}"
    }.mkString("{", ",", "}")
    val allRuns = results.map { case (name, runs) =>
      s"\"$name\":[${runs.drop(1).map(r => if (r._2) fmt(r._1) else "null").mkString(",")}]"
    }.mkString("{", ",", "}")
    val warmups = results.map { case (name, runs) =>
      s"\"$name\":${if (runs.head._2) fmt(runs.head._1) else "null"}"
    }.mkString("{", ",", "}")
    val failed = results.collect {
      case (name, runs) if runs.drop(1).exists(!_._2) => s"\"$name\"" }
    val total = mins.flatMap(_._2).sum
    // FULL record (every named map) → the durable file, committed each
    // round as BENCH_LAST.json.
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$Runs,"agg":"min-after-warmup","warmup_times":$warmups,"run_times":$allRuns,"failed":[${failed.mkString(",")}]}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LAST.json")
    // guarded: a failed file write (bad path, full disk) must never
    // cost the stdout contract line below — after a multi-hour sweep
    // the compact line is the only surviving record
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
      println(s"[bench] full json written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] WARN: could not write $outPath: $e")
    }
    // STDOUT gets a COMPACT line, printed LAST: the driver captures
    // only a ~1.9 KB log tail, and the full 162-query named JSON is
    // ~14 KB — every round through r15 it arrived truncated and
    // parsed as null. The compact line keeps the driver-contract keys
    // (metric/value/unit/queries/sf) but bounds "queries" to the 5
    // SLOWEST (labeled via queries_note so a partial map can never
    // masquerade as the full sweep), and carries EVERY per-query
    // timing as a 3-dp array in query-NAME-ASC order — names
    // reconstruct from SparkEntry.queries keys sorted, which is also
    // the full file's key order. ~1.3 KB at 162 queries → survives
    // the tail window whole.
    val qtimes = mins.map(_._2.map(fmt3).getOrElse("null"))
      .mkString("[", ",", "]")
    val slowest = mins.collect { case (n, Some(t)) => (n, t) }
      .sortBy(-_._2).take(5)
      .map { case (n, t) => s"\"$n\":${fmt3(t)}" }
      .mkString("{", ",", "}")
    def compactLine(times: String, failedRepr: String) =
      s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$slowest,"queries_note":"5 slowest of n_queries; all timings in qtimes; full named maps in detail_file","sf":"$sfDir","runs":$Runs,"agg":"min-after-warmup","n_queries":${mins.size},"queries_order":"name-asc","qtimes":$times,"failed":$failedRepr,"detail_file":"$outPath"}"""
    // size guard against the ~1.9 KB driver tail window this line
    // exists to fit into: qtimes grows ~7 bytes/query (230+ queries
    // would silently reintroduce the truncation this format fixed),
    // and a sweep with MANY failures grows the failed-names array
    // unboundedly — so degrade stepwise (drop qtimes, then collapse
    // failed names to a count; the file still has everything) until
    // the line fits, and say so on stderr
    val failedArr = s"[${failed.mkString(",")}]"
    val candidates = Seq(
      compactLine(qtimes, failedArr),
      compactLine("\"omitted-over-budget\"", failedArr),
      compactLine("\"omitted-over-budget\"",
        s"""{"n_failed":${failed.size},"names":"see detail_file"}"""))
    val emit = candidates.find(_.length <= 1600).getOrElse(candidates.last)
    if (emit ne candidates.head)
      System.err.println(s"[bench] WARN: compact line " +
        s"${candidates.head.length} B exceeds the tail-window budget; " +
        "degraded (qtimes and/or failed names omitted)")
    println(emit)
    spark.stop()
  }
}
