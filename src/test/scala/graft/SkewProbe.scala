package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off r13 probe: Skew.saltedJoin under a REAL hot key at scale.
  * Builds a 20 M-row fact from sf1 events with 30% of rows remapped
  * to one user, joins a ~100 k-row per-user dim (too large to
  * broadcast by scenario — broadcast disabled, the 100 TB dim
  * regime), and measures unsalted vs salted (32 buckets) wall with
  * AQE's skew-join splitting off and on. Not part of the API.
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Skew

    // 20M-row fact: sf1 events ×20, 30% of rows on hot user 42
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
    fact.write.mode("overwrite").parquet("/tmp/skew_fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_dim")
    val f = spark.read.parquet("/tmp/skew_fact")
    val d = spark.read.parquet("/tmp/skew_dim")
    println(s"SKEWPROBE hotTenths=$hotTenths fact=${f.count()} dim=${d.count()} " +
      s"hot=${f.where(col("user_id") === 42).count()}")

    // the 100 TB dim regime: never broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def timeIt(tag: String)(mk: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = mk.groupBy(col("segment"))
        .agg(sum(col("value")).as("sv")).collect().length
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"SKEWPROBE $tag segments=$n wall=$secs%.2f s")
      secs
    }
    def sweep(regime: String): Unit = {
      timeIt(s"$regime warmup")(f.join(d, Seq("user_id")))
      val plainW = (1 to 2).map(_ =>
        timeIt(s"$regime plain")(f.join(d, Seq("user_id")))).min
      val saltW = (1 to 2).map(_ => timeIt(s"$regime salted")(
        Skew.saltedJoin(f, d, "user_id", col("value") * 1e6, 32))).min
      println(f"SKEWPROBE $regime min_plain=$plainW%.2f " +
        f"min_salted=$saltW%.2f ratio=${plainW / saltW}%.2f")
    }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sweep("aqe_off")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    sweep("aqe_on")
  }
}
