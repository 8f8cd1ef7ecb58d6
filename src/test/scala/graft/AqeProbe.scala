package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Test-scope probe for the first knob a real 100 TB deployment
  * turns: `spark.sql.shuffle.partitions` under AQE coalescing. The
  * shipped local config pins partitions=32 (one per core — at local
  * scale the per-partition constant dominates); a lake deployment
  * instead OVER-partitions (2-3x total cores, here 16x as the probe's
  * exaggerated stand-in) and lets AQE coalesce small post-shuffle
  * partitions back down. This probe measures the same headliner
  * plans under both regimes at the given SF so SURVEY §5 can state
  * the delta from measurement instead of doctrine. Usage:
  *   sbt "Test/runMain graft.AqeProbe" (SPARK_GRAFT_SF_DIR selects
  *   scale, default the sf1 scaleprobe corpus.)
  */
object AqeProbe {

  private val Headliners = Seq(
    "dedup_minhash_lsh", "dedup_cluster", "corpus_dsir",
    "vs_ivf_pq", "pack_shards")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse(
      "SPARK_GRAFT_SF_DIR", "/root/repo/.scaleprobe/sf1")
    val names = if (args.nonEmpty) args.toSeq else Headliners
    // over-partition-then-coalesce regime at N initial partitions
    def aqeAt(n: Int) = Map(
      "spark.sql.shuffle.partitions" -> n.toString,
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
        -> n.toString)
    val allRegimes = Seq(
      // the shipped local shape: partitions = cores
      ("shipped-32", Map.empty[String, String]),
      // the §4 doctrine's recommendation: 2-3× total cores
      ("aqe-64", aqeAt(64)),
      ("aqe-96", aqeAt(96)),
      // the exaggerated 16× shape (r17's probe point)
      ("aqe-512", aqeAt(512)),
      // NOT AQE's unpinned mode: partitions stay pinned at 512, the
      // advisory byte target is layered ON TOP — AQE coalesces toward
      // ~64 MB post-shuffle partitions but never exceeds the pin.
      // (r17 ran this as "aqe-auto"; relabeled — the SURVEY row it fed
      // is the 512+advisory point, not an unpinned measurement.)
      ("aqe-advisory-512", aqeAt(512) +
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m")))
    // SPARK_GRAFT_REGIMES=aqe-64,aqe-96 selects a subset (probe runs
    // at sf1 are minutes per regime; stretch runs need only the new
    // points next to shipped-32)
    val regimes = sys.env.get("SPARK_GRAFT_REGIMES") match {
      case Some(sel) =>
        val want = sel.split(",").map(_.trim).toSet
        allRegimes.filter { case (n, _) => want(n) }
      case None => allRegimes
    }
    regimes.foreach { case (regime, extra) =>
      val b = Sessions.localBuilder(32)
      extra.foreach { case (k, v) => b.config(k, v) }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      sys.env.get("SPARK_GRAFT_CKPT_DIR")
        .foreach(spark.sparkContext.setCheckpointDir)
      spark.range(1000000L).selectExpr("sum(id)").collect()
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val times = (0 to 2).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.agg(sum(xxhash64(df.columns.map(col): _*)
            .cast("decimal(38,0)"))).collect()
          val dt = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          System.gc()
          dt
        }
        println(String.format(java.util.Locale.ROOT,
          "AQE %s %s %.3f (warmup %.3f)", regime, name,
          Double.box(times.drop(1).min), Double.box(times.head)))
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
