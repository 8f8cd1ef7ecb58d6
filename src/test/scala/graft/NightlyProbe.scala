package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r13 probe: the measured cost of the index-side exchange
  * that `Corpus.writeBucketed` removes from the nightly
  * `Dedup.incrementalLsh` probe. Builds the sf1 band index once,
  * persists it twice (bucketed by bkey / plain parquet), and times
  * the probe against each layout, warm, in both planner regimes:
  *  - defaults (AQE on, auto-broadcast on) — the local[32] nightly;
  *  - sort-merge pinned (AQE off, broadcast off) — the regime a
  *    100 TB corpus index is ALWAYS in (nothing is broadcastable),
  *    i.e. the regime the DedupSpec plan pin covers.
  * Not part of the API.
  */
object NightlyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.scaleprobe/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir", "/tmp/nightly_probe_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    import graft.sources.Corpus

    val docs = Tables.documents(spark, sfDir)
    val isNew = pmod(col("doc_id"), lit(10)) === 7
    val base = docs.where(!isNew)
    val delta = docs.where(isNew)

    val index = Dedup.minhashBandIndex(base, "doc_id", "text")
    Corpus.writeBucketed(index, "nightly_idx_bkt", "bkey", 32)
    index.write.mode("overwrite").format("parquet")
      .saveAsTable("nightly_idx_plain")
    val nIdx = spark.table("nightly_idx_bkt").count()
    println(s"NIGHTLYPROBE index_rows=$nIdx")

    def run(table: String): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.incrementalLsh(spark.table(table), base, delta,
        "doc_id", "text", minJaccard = 0.5, cacheIndex = false).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // the op caches newSh/cand/oldSh internally — clear so every
      // timed run pays the full probe, not a prior run's cache
      spark.catalog.clearCache()
      (n, secs)
    }

    def sweep(regime: String): Unit = {
      // one discarded warm-up (JIT + file listing), then alternate
      // layouts twice each; report per-iteration walls
      run("nightly_idx_bkt")
      val walls = Seq("nightly_idx_plain", "nightly_idx_bkt",
        "nightly_idx_plain", "nightly_idx_bkt").map { t =>
        val (n, s) = run(t); (t, n, s)
      }
      walls.foreach { case (t, n, s) =>
        println(f"NIGHTLYPROBE regime=$regime table=$t rows=$n wall=$s%.2f s")
      }
      val best = walls.groupBy(_._1).map { case (t, xs) =>
        t -> xs.map(_._3).min }
      println(f"NIGHTLYPROBE regime=$regime min_plain=${
        best("nightly_idx_plain")}%.2f min_bkt=${
        best("nightly_idx_bkt")}%.2f ratio=${
        best("nightly_idx_plain") / best("nightly_idx_bkt")}%.2f")
    }

    sweep("defaults")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sweep("sortmerge")
  }
}
