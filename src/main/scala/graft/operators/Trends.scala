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

  /** Research-gap identification: patterns from a curated list that
    * do NOT appear among the corpus's top keywords become gap reports
    * (reference: backend/app/utils/trend_analyzer.py:284
    * _identify_gaps — gap_patterns anti-joined against the keyword
    * set, first 5 kept). `keywords` is an already-top-k-pruned frame
    * (driver-scale), so the anti-join broadcasts it.
    */
  def gaps(
      keywords: DataFrame, keywordCol: String,
      patterns: Seq[(String, String)], k: Int): DataFrame = {
    val spark = keywords.sparkSession
    import spark.implicits._
    val pat = patterns.zipWithIndex
      .map { case ((p, msg), i) => (i.toLong, p, msg) }
      .toDF("pid", "pattern", "gap_msg")
    pat.join(broadcast(keywords.select(col(keywordCol).as("pattern"))),
        Seq("pattern"), "left_anti")
      .orderBy(col("pid"))
      .limit(k)
      .select(col("pattern"), col("gap_msg"))
  }

  /** Per-topic trend matching: docs already classified to a topic
    * (e.g. by TextAnalysis.lensClassify) are counted in early vs late
    * year windows and labelled rising/declining/stable with the same
    * 1.1/0.9 thresholds as `growth`
    * (reference: backend/app/core/oncology_trends.py:62 — per-topic
    * paper counts joined to trend windows). One map-side-combinable
    * groupBy on the topic key; no other shuffle.
    */
  def topicGrowth(
      docs: DataFrame, topicCol: String, yearCol: String,
      midYear: Int): DataFrame =
    docs.groupBy(col(topicCol))
      .agg(
        sum(when(col(yearCol) <= midYear, 1).otherwise(0)).as("early_cnt"),
        sum(when(col(yearCol) > midYear, 1).otherwise(0)).as("late_cnt"))
      .withColumn("growth_ratio",
        round(col("late_cnt").cast("double") /
          greatest(col("early_cnt").cast("double"), lit(1.0)), 6))
      .withColumn("trend",
        when(col("growth_ratio") > 1.1, "rising")
          .when(col("growth_ratio") < 0.9, "declining")
          .otherwise("stable"))

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
