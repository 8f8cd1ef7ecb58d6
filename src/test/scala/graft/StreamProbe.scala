package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope scale probe for the STATEFUL streaming path (not part
  * of the library API): replays a ScaleUp-sized event corpus through
  * `StreamingAggs.sessionizeStream` on the parquet FILE source, one
  * day-file per micro-batch, and reports wall time, emitted
  * sessions, and state-store telemetry from the progress log — the
  * numbers SURVEY §6's streaming-state note records.
  *
  * Day-sliced files + maxFilesPerTrigger=1 make the watermark
  * advance batch by batch (as in production), so sessions close by
  * event-time timeout throughout the run and state occupancy is the
  * honest steady-state figure, not one giant single-batch pass.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val eventsDir = args.headOption
      .getOrElse("/root/repo/.scaleprobe/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.streaming.{SessionEvent, StreamingAggs}

    // stage: one file per day, written in day order so the file
    // source's discovery order follows event time
    val src = java.nio.file.Files
      .createTempDirectory("graft_stream_probe").toFile.getAbsolutePath
    // Tables.events normalizes ts to LONG nanos — convert to a real
    // timestamp for the watermark clock
    val ev = Tables.events(spark, eventsDir)
      .select(col("user_id"),
        timestamp_micros((col("ts") / 1000L).cast("long")).as("ts"),
        col("value"))
      .withColumn("day", to_date(col("ts")))
      .cache()
    val days = ev.select(col("day")).distinct()
      .orderBy(col("day")).as[java.sql.Date].collect()
    println(s"PROBE events=${ev.count()} days=${days.length}")
    days.zipWithIndex.foreach { case (d, i) =>
      ev.where(col("day") === d).drop("day").coalesce(1)
        .write.mode("append").parquet(f"$src/d$i%03d.parquet")
    }

    val t0 = System.nanoTime()
    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*")
    val query = StreamingAggs.sessionizeStream(
      stream.as[SessionEvent], gapSecs = 1800L)
      .writeStream
      .format("memory")
      .queryName("probe_sessions")
      .outputMode("append")
      .start()
    query.processAllAvailable()
    val wall = (System.nanoTime() - t0) / 1e9
    val sessions = spark.table("probe_sessions").count()
    val stateRows = query.recentProgress.flatMap(
      _.stateOperators.map(_.numRowsTotal))
    val stateMem = query.recentProgress.flatMap(
      _.stateOperators.map(_.memoryUsedBytes))
    val batches = query.recentProgress.length
    query.stop()
    // an empty progress log (no day files / no recorded batches) must
    // still report the wall/session numbers, not crash on empty.max
    val rowStats = if (stateRows.isEmpty) "maxStateRows=n/a" else
      f"maxStateRows=${stateRows.max} lastStateRows=${stateRows.last} " +
        f"maxStateMB=${stateMem.max / 1e6}%.1f"
    println(f"PROBE_RESULT wall=$wall%.1fs sessions=$sessions " +
      s"batches=$batches $rowStats")
    spark.stop()
  }
}
