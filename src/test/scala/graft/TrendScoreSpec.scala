package graft

import org.apache.spark.sql.functions._

import graft.operators.TrendScore

/** Unit specs for the multi-dimensional trend ladders — the rungs
  * the sf0.01 binding can't reach (10k-paper volumes, 5k-trial
  * counts) plus the piecewise boundaries.
  */
class TrendScoreSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.as("v")).collect().head.getDouble(0)

  test("risingScore piecewise segments and boundaries") {
    assert(eval1(TrendScore.risingScore(lit(60.0))) == 100.0)
    assert(eval1(TrendScore.risingScore(lit(50.0))) == 100.0)
    assert(eval1(TrendScore.risingScore(lit(40.0))) == 90.0)  // 80+10
    assert(eval1(TrendScore.risingScore(lit(15.0))) == 60.0)
    assert(eval1(TrendScore.risingScore(lit(10.0))) == 50.0)  // 40+10
    assert(eval1(TrendScore.risingScore(lit(0.0))) == 20.0)
    assert(eval1(TrendScore.risingScore(lit(-10.0))) == 10.0) // 20-10
    assert(eval1(TrendScore.risingScore(lit(-50.0))) == 0.0)  // floor
  }

  test("interestScore: velocity cap and volume rungs") {
    assert(eval1(TrendScore.interestScore(lit(300.0), lit(100L)))
      == 100.0) // velocity capped at 100
    assert(eval1(TrendScore.interestScore(lit(100.0), lit(12000L)))
      == 80.0)  // 50 + 30
    assert(eval1(TrendScore.interestScore(lit(100.0), lit(6000L)))
      == 70.0)  // 50 + 20
    assert(eval1(TrendScore.interestScore(lit(100.0), lit(1500L)))
      == 60.0)  // 50 + 10
    assert(eval1(TrendScore.interestScore(lit(180.0), lit(12000L)))
      == 100.0) // total cap
  }

  test("activityScore: paper and trial rungs, linear trial tail") {
    assert(eval1(TrendScore.activityScore(lit(6000L), lit(200L)))
      == 100.0) // 50 + 50
    assert(eval1(TrendScore.activityScore(lit(2000L), lit(60L)))
      == 80.0)  // 40 + 40
    assert(eval1(TrendScore.activityScore(lit(600L), lit(30L)))
      == 60.0)  // 30 + 30
    assert(eval1(TrendScore.activityScore(lit(150L), lit(10L)))
      == 40.0)  // 20 + 20
    assert(eval1(TrendScore.activityScore(lit(50L), lit(3L)))
      == 16.0)  // 10 + 3·2
  }

  test("futureScore: ratio piecewise and zero-total guard") {
    assert(eval1(TrendScore.futureScore(lit(0L), lit(0L))) == 0.0)
    assert(eval1(TrendScore.futureScore(lit(15L), lit(100L))) == 100.0)
    assert(eval1(TrendScore.futureScore(lit(6L), lit(100L)))
      == 88.0)  // 70 + 6·3
    assert(eval1(TrendScore.futureScore(lit(3L), lit(100L)))
      == 58.0)  // 40 + 3·6
    assert(eval1(TrendScore.futureScore(lit(1L), lit(100L)))
      == 20.0)  // 1% · 20
  }

  test("yearlySummary: direction cuts, null growth, peak tie-break") {
    val counts = Seq(
      // rising: halves 10,10 vs 13,13 → 13 > 10·1.2
      ("up", 2020L, 10L), ("up", 2021L, 10L),
      ("up", 2022L, 13L), ("up", 2023L, 13L),
      // stable: 10,10 vs 11,11 (11 < 12)
      ("flat", 2020L, 10L), ("flat", 2021L, 10L),
      ("flat", 2022L, 11L), ("flat", 2023L, 11L),
      // declining; peak tie 2020/2021 → earliest
      ("down", 2020L, 9L), ("down", 2021L, 9L),
      ("down", 2022L, 0L), ("down", 2023L, 2L),
      // zero first year → null growth
      ("zf", 2020L, 0L), ("zf", 2021L, 5L),
      ("zf", 2022L, 5L), ("zf", 2023L, 5L),
      // single year → stable, null growth
      ("one", 2020L, 5L)
    ).toDF("kw", "year", "cnt")
    val out = TrendScore.yearlySummary(counts, "kw", "year", "cnt")
      .collect().map(r => r.getAs[String]("kw") -> r).toMap
    assert(out("up").getAs[String]("trend_direction") == "rising")
    assert(out("up").getAs[Double]("growth_5yr") == 30.0)
    assert(out("flat").getAs[String]("trend_direction") == "stable")
    assert(out("down").getAs[String]("trend_direction") == "declining")
    assert(out("down").getAs[Double]("growth_5yr") == -77.8)
    assert(out("down").getAs[Long]("peak_year") == 2020L) // tie → first
    assert(out("zf").getAs[String]("trend_direction") == "rising")
    assert(out("zf").isNullAt(out("zf").fieldIndex("growth_5yr")))
    assert(out("one").getAs[String]("trend_direction") == "stable")
    assert(out("up").getAs[Long]("total_count") == 46L)
  }

  test("emergingTopics: zero-prev needs current > 10, min-current cut") {
    val m = Seq(
      ("b new11", "new11", 11L, 0L),  // prev 0, cur 11 > 10 → 100
      ("b new10", "new10", 10L, 0L),  // prev 0, cur 10 NOT > 10 → 0
      ("b grown", "grown", 15L, 10L), // +50
      ("b tiny", "tiny", 4L, 0L))     // < 5 current → dropped
      .toDF("topic", "modifier", "current_year_count",
        "two_years_ago_count")
    val out = TrendScore.emergingTopics(m)
      .collect().map(r => r.getAs[String]("modifier") ->
        r.getAs[Double]("growth_rate")).toMap
    assert(out == Map("new11" -> 100.0, "new10" -> 0.0,
      "grown" -> 50.0))
  }

  test("enhanced: label reads rounded scores, stage reads raw") {
    val m2 = Seq(("edge", 12996L, 10000L, 100L, 0L, 260.0))
      .toDF("keyword", "current_papers", "previous_papers",
        "clinical_trials", "future_mentions", "citation_velocity")
    // growth = 29.96 → rising_raw 89.92? no: 29.96 is in [15,30):
    // 60 + 14.96·1.33 = 79.8968 → rounds 79.9 (< 80) → not Explosive
    val out = TrendScore.enhanced(m2).collect().head
    assert(out.getAs[Double]("rising_score") == 79.9)
    assert(out.getAs[String]("trend_label") == "Rising") // ≥60
    // stage: activity_raw = 50+50 = 100 ≥ 30, rising_raw 79.9 ≥ 30
    assert(out.getAs[String]("research_stage") == "Growth Phase")
    assert(out.getAs[String]("recommendation") ==
      "Rapidly growing interest • 100 active clinical trials")
  }
}
