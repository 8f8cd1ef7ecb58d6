package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trend analytics — re-expression of the reference's trend detection
  * (reference: backend/app/utils/trend_analyzer.py:129 analyze —
  * per-year histograms; :232 _detect_trends — recent-window vs
  * prior-window growth ratios with rising/declining labels).
  */
object Trends {

  /** Per-day, per-type counts with a 7-row trailing moving average
    * over the days present for that type.
    */
  def dailyWithMovingAvg(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    daily.withColumn("ma7", round(avg(col("cnt")).over(w) + lit(1e-9), 4))
  }

  /** Growth of late-half vs early-half event counts per type.
    * The midpoint is integer-second arithmetic — engine-stable.
    */
  def growth(events: DataFrame): DataFrame = {
    val withS = events.withColumn("s", Events.tsSecs("ts"))
    val bounds = withS.agg(
      min(col("s")).as("min_s"), max(col("s")).as("max_s"))
    withS
      .crossJoin(broadcast(bounds))
      .withColumn("mid", expr("(min_s + max_s) div 2"))
      .withColumn("half",
        when(col("s") > col("mid"), "late").otherwise("early"))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("half") === "early", 1).otherwise(0)).as("early_cnt"),
        sum(when(col("half") === "late", 1).otherwise(0)).as("late_cnt"))
      .withColumn("growth_ratio",
        round(col("late_cnt").cast("double") /
          greatest(col("early_cnt").cast("double"), lit(1.0)), 6))
      .withColumn("trend",
        when(col("growth_ratio") > 1.1, "rising")
          .when(col("growth_ratio") < 0.9, "declining")
          .otherwise("stable"))
  }
}
