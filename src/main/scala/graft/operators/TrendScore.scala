package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional hot-topic scoring + keyword yearly-trend
  * summaries — re-expression of the reference's trends route
  * (reference: backend/app/api/routes/trends.py:253-:334 the four
  * dimension ladders, :610 get_enhanced_hot_topics — weighted
  * 30/25/25/20 composite with label / stage / recommendation
  * ladders; :459 calculate_trend_direction, :475
  * calculate_5yr_growth, :490 analyze_keyword_trend peak year).
  *
  * Scale shape: dimension scoring is a pure per-row projection over
  * a keyword-panel-sized frame (the per-keyword metrics are
  * aggregates the binding computes in one corpus pass). The yearly
  * summary aggregates (keyword, year) with map-side combine, then
  * summarizes per keyword — windows partition on the keyword key.
  */
object TrendScore {

  /** Rising ladder (trends.py:253): piecewise-linear 0-100 from the
    * YoY growth rate.
    */
  def risingScore(growth: Column): Column =
    when(growth >= 50, 100.0)
      .when(growth >= 30, lit(80.0) + (growth - 30) * 1.0)
      .when(growth >= 15, lit(60.0) + (growth - 15) * 1.33)
      .when(growth >= 5, lit(40.0) + (growth - 5) * 2.0)
      .when(growth >= 0, lit(20.0) + growth * 4.0)
      .otherwise(greatest(lit(0.0), lit(20.0) + growth))

  /** Interest ladder (trends.py:269): capped velocity/2 plus the
    * volume bonus rungs.
    */
  def interestScore(velocity: Column, totalPapers: Column): Column =
    least(lit(100.0),
      least(lit(100.0), velocity / 2) +
        when(totalPapers >= 10000, 30.0).when(totalPapers >= 5000, 20.0)
          .when(totalPapers >= 1000, 10.0).otherwise(0.0))

  /** Activity ladder (trends.py:287): paper-volume rungs plus
    * clinical-trial rungs, capped at 100.
    */
  def activityScore(currentPapers: Column, trials: Column): Column = {
    val paperScore = when(currentPapers >= 5000, 50.0)
      .when(currentPapers >= 1000, 40.0).when(currentPapers >= 500, 30.0)
      .when(currentPapers >= 100, 20.0).otherwise(10.0)
    val trialScore = when(trials >= 100, 50.0).when(trials >= 50, 40.0)
      .when(trials >= 20, 30.0).when(trials >= 5, 20.0)
      .otherwise(trials.cast("double") * 2)
    least(lit(100.0), paperScore + trialScore)
  }

  /** Future-potential ladder (trends.py:316) from the gap-mention
    * ratio.
    */
  def futureScore(futureMentions: Column, totalPapers: Column): Column = {
    val ratio =
      futureMentions.cast("double") / totalPapers.cast("double") * 100
    when(totalPapers === 0, 0.0)
      .when(ratio >= 10, 100.0)
      .when(ratio >= 5, lit(70.0) + ratio * 3)
      .when(ratio >= 2, lit(40.0) + ratio * 6)
      .otherwise(ratio * 20)
  }

  /** The enhanced hot-topic frame (trends.py:610): expects per-
    * keyword metric columns (current_papers, previous_papers,
    * clinical_trials, future_mentions, citation_velocity); emits the
    * four rounded dimension scores, the 30/25/25/20 composite, and
    * the label/stage/recommendation ladders. Faithful rounding
    * split: trend_label and recommendation read the ROUNDED scores
    * (the reference passes the rounded model), research_stage reads
    * the UNROUNDED dimension values.
    */
  def enhanced(metrics: DataFrame, topN: Int = 10): DataFrame = {
    val growth = when(col("previous_papers") > 0,
        (col("current_papers") - col("previous_papers")).cast("double")
          / col("previous_papers") * 100)
      .otherwise(when(col("current_papers") > 0, 100.0).otherwise(0.0))
    val total = col("current_papers") + col("previous_papers")
    val withRaw = metrics
      .withColumn("growth_raw", growth)
      .withColumn("rising_raw", risingScore(col("growth_raw")))
      .withColumn("interest_raw",
        interestScore(col("citation_velocity"), total))
      .withColumn("activity_raw",
        activityScore(col("current_papers"), col("clinical_trials")))
      .withColumn("future_raw", futureScore(col("future_mentions"), total))
      .withColumn("total_raw",
        col("rising_raw") * 0.30 + col("interest_raw") * 0.25 +
          col("activity_raw") * 0.25 + col("future_raw") * 0.20)
    def r1(c: Column) = round(c + lit(1e-9), 1)
    val scored = withRaw
      .withColumn("rising_score", r1(col("rising_raw")))
      .withColumn("interest_score", r1(col("interest_raw")))
      .withColumn("activity_score", r1(col("activity_raw")))
      .withColumn("future_score", r1(col("future_raw")))
      .withColumn("total_score", r1(col("total_raw")))
      .withColumn("growth_rate", r1(col("growth_raw")))
    // label ladder (:335) over the ROUNDED scores
    val label =
      when(col("rising_score") >= 80 && col("total_score") >= 70,
        "Explosive")
        .when(col("rising_score") >= 60, "Rising")
        .when(col("future_score") >= 70 && col("activity_score") < 50,
          "Emerging")
        .when(col("activity_score") >= 70, "Established")
        .otherwise("Stable")
    // stage ladder (:349) over the UNROUNDED dimensions
    val stage =
      when(col("activity_raw") < 30 && col("rising_raw") >= 50,
        "Early Stage")
        .when(col("activity_raw") >= 30 && col("rising_raw") >= 30,
          "Growth Phase")
        .when(col("activity_raw") >= 60 && col("rising_raw") < 20,
          "Mature Field")
        .when(col("activity_raw") >= 50 && col("future_raw") >= 60,
          "Active Innovation")
        .otherwise("Developing")
    // recommendation (:363): first 2 insights in reference order,
    // over the ROUNDED scores
    val insights = array(
      when(col("rising_score") >= 70, "Rapidly growing interest"),
      when(col("future_score") >= 60, "Many research gaps remain"),
      when(col("clinical_trials") >= 20,
        concat(col("clinical_trials").cast("string"),
          lit(" active clinical trials"))),
      when(col("activity_score") >= 70 && col("rising_score") < 30,
        "Well-established field"),
      when(col("interest_score") >= 70, "High researcher attention"))
    val kept = slice(filter(insights, c => c.isNotNull), 1, 2)
    scored
      .withColumn("recommendation",
        when(size(kept) === 0, "Moderate research activity")
          .otherwise(array_join(kept, " • ")))
      .withColumn("trend_label", label)
      .withColumn("research_stage", stage)
      .orderBy(col("total_score").desc, col("keyword"))
      .limit(topN)
      .select(col("keyword"), col("current_papers"),
        col("previous_papers"), col("growth_rate"),
        col("clinical_trials"), col("future_mentions"),
        col("rising_score"), col("interest_score"),
        col("activity_score"), col("future_score"), col("total_score"),
        col("trend_label"), col("research_stage"),
        col("recommendation"))
  }

  /** Emerging sub-topics (trends.py:751 find_emerging_topics):
    * base×modifier counts for the current year vs TWO years ago;
    * growth with the zero-prev special that calls a topic new only
    * above newThreshold (unlike every other prev=0 branch in the
    * reference, which tests > 0); topics below minCurrent drop;
    * ranked by growth.
    */
  def emergingTopics(
      metrics: DataFrame, minCurrent: Long = 5, newThreshold: Long = 10,
      topN: Int = 10): DataFrame = {
    val growth = when(col("two_years_ago_count") > 0,
        (col("current_year_count") - col("two_years_ago_count"))
          .cast("double") / col("two_years_ago_count") * 100)
      .otherwise(when(col("current_year_count") > newThreshold, 100.0)
        .otherwise(0.0))
    metrics.where(col("current_year_count") >= minCurrent)
      .withColumn("growth_rate", round(growth + lit(1e-9), 1))
      .orderBy(col("growth_rate").desc, col("topic"))
      .limit(topN)
      .select(col("topic"), col("modifier"),
        col("current_year_count"), col("two_years_ago_count"),
        col("growth_rate"))
  }

  /** Per-keyword yearly summary (trends.py:490): totals, the
    * first-half vs second-half ±20% direction call (:459), the
    * first-vs-last 5-yr growth (:475, null when the first year is
    * 0), and the peak year (max count, earliest on ties — the
    * reference iterates years in order and keeps the first
    * maximum).
    */
  def yearlySummary(
      counts: DataFrame, kwCol: String, yearCol: String,
      cntCol: String): DataFrame = {
    val wk = Window.partitionBy(col(kwCol))
    val wOrd = wk.orderBy(col(yearCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPeak = wk.orderBy(col(cntCol).desc, col(yearCol))
    val enriched = counts
      .withColumn("idx", row_number().over(wk.orderBy(col(yearCol))))
      .withColumn("ny", count(lit(1)).over(wk))
      .withColumn("first_cnt", first(col(cntCol)).over(wOrd))
      .withColumn("last_cnt", last(col(cntCol)).over(wOrd))
      .withColumn("peak_rn", row_number().over(wPeak))
    enriched.groupBy(col(kwCol))
      .agg(
        sum(col(cntCol)).as("total_count"),
        max(col("ny")).as("ny"),
        avg(when(col("idx") <= col("ny") / 2, col(cntCol))).as("fh"),
        avg(when(col("idx") > col("ny") / 2, col(cntCol))).as("sh"),
        max(col("first_cnt")).as("first_cnt"),
        max(col("last_cnt")).as("last_cnt"),
        max(when(col("peak_rn") === 1, col(yearCol))).as("peak_year"),
        max(when(col("peak_rn") === 1, col(cntCol))).as("peak_count"))
      .select(col(kwCol), col("total_count"),
        when(col("ny") < 2, "stable")
          .when(col("sh") > col("fh") * 1.2, "rising")
          .when(col("sh") < col("fh") * 0.8, "declining")
          .otherwise("stable").as("trend_direction"),
        when(col("ny") < 2 || col("first_cnt") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            (col("last_cnt") - col("first_cnt")).cast("double")
              / col("first_cnt") * 100 + lit(1e-9), 1))
          .as("growth_5yr"),
        col("peak_year"), col("peak_count"))
  }
}
