package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event operators
  * (graft.operators.Events). Same logical shapes — tumbling windows,
  * sessionization-ready keyed state — expressed on an unbounded
  * source with watermarks. The batch variants are the
  * oracle-checkable versions; these run the identical aggregation
  * plan incrementally.
  *
  * At cluster scale: state store is keyed by (window, event_type) /
  * (user_id) — partition count = shuffle partitions; watermark bounds
  * state size so 100 TB/day of events holds only the open windows.
  */
object StreamingAggs {

  /** Tumbling-window count/sum per event type over a streaming frame
    * with a `ts` TimestampType column. Late data beyond the watermark
    * is dropped (correct-by-watermark, same result as the batch
    * dailyAgg once all on-time data arrives).
    */
  def windowedAgg(
      events: DataFrame, windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Streaming top-event-type rates: running counts per type (complete
    * mode aggregation for dashboards).
    */
  def runningCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
}
