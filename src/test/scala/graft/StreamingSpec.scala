package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingAggs

class StreamingSpec extends SparkSpec {

  test("windowedAgg aggregates tumbling windows over a memory stream") {
    val sql = spark.sqlContext
    import spark.implicits._
    implicit val ctx = sql

    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val agg = StreamingAggs.windowedAgg(events, "1 hour", "10 minutes")
    val query = agg.writeStream
      .format("memory")
      .queryName("windowed_agg_test")
      .outputMode(OutputMode.Append())
      .start()

    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    input.addData((t(1, 5), "click", 1.0), (t(1, 30), "click", 2.0),
      (t(1, 45), "view", 3.0))
    query.processAllAvailable()
    // advance watermark far enough to close the 01:00 window
    input.addData((t(3, 0), "click", 1.0))
    query.processAllAvailable()
    input.addData((t(5, 0), "click", 1.0))
    query.processAllAvailable()

    val rows = spark.table("windowed_agg_test").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("sum_value"))).toMap
    query.stop()

    assert(rows(("2024-01-01 01:00:00.0", "click")) == (2L, 3.0))
    assert(rows(("2024-01-01 01:00:00.0", "view")) == (1L, 3.0))
  }
}
