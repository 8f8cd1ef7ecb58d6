package graft

import org.apache.spark.sql.functions.{col, sum, xxhash64}

import graft.operators.SkewAdvisor

/** Probe (r19): SkewAdvisor as a NEGATIVE control over the library's
  * own heaviest queries — the operators' key designs (banded buckets,
  * digest groupings, salted CC rounds) are supposed to produce
  * BALANCED shuffles, and the advisor is the instrument that can now
  * check that claim from observed bytes instead of plan reading.
  * For each query: materialize via the Bench checksum action, then
  * report every shuffle's max/median compressed partition bytes and
  * whether the advisor would recommend a skew intervention.
  * Not part of the API; run with Test/runMain graft.AdvisorSweep
  * [sfDir] [q1,q2,...].
  */
object AdvisorSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.scaleprobe/sf1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_minhash_lsh", "dedup_cluster", "dedup_select",
        "dedup_ngram_jaccard", "ev_sessionize", "integrated_driver")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val agg = df.agg(sum(xxhash64(df.columns.map(col): _*)
        .cast("decimal(38,0)")))
      agg.collect()
      val rec = SkewAdvisor.recommend(agg)
      val worst = rec.profiles.sortBy(-_.skewRatio).headOption
      println(s"ADVISORSWEEP $name shuffles=${rec.profiles.size} " +
        s"worst=${worst.map(p => f"${p.skewRatio}%.1fx (max=${p.maxBytes} " +
          s"med=${p.medianBytes} mappers=${p.numMappers})").getOrElse("none")} " +
        s"recommendation=${if (rec.thresholdBytes.isDefined) "SKEW-TUNE"
          else if (rec.skewed.isDefined) "UNSPLITTABLE"
          else "none"}")
      rec.profiles.filter(_.skewRatio >= 3.0).foreach(p => println(
        s"ADVISORSWEEP $name   shuffle=${p.shuffleId} parts=${p.numPartitions} " +
          f"max=${p.maxBytes} med=${p.medianBytes} ratio=${p.skewRatio}%.1f"))
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
