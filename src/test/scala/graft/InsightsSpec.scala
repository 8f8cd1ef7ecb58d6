package graft

import graft.operators.Insights

class InsightsSpec extends SparkSpec {
  import spark.implicits._

  private def quality(texts: (Long, String)*) =
    Insights.paperQuality(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("design ladder resolves in evidence-hierarchy order, first hit wins") {
    val m = quality(
      // both meta-analysis and RCT phrases: hierarchy says meta wins
      (1L, "A meta-analysis of randomized trials"),
      (2L, "a double-blind placebo-controlled study"),
      (3L, "nothing clinical here at all"))
    assert(m(1L).getString(1) == "Meta-Analysis" && m(1L).getLong(2) == 10L)
    assert(m(2L).getString(1) == "Randomized Controlled Trial")
    assert(m(3L).getString(1) == "Unknown" && m(3L).getLong(2) == 0L)
  }

  test("sample size: first in-range pattern wins; out-of-range falls through") {
    val m = quality(
      (1L, "cohort study with n = 250 patients"),
      // n= capture is out of range -> the '450 patients' pattern catches
      (2L, "n = 2000000 across sites, but 450 patients analyzed"),
      (3L, "no numbers"))
    assert(m(1L).getLong(3) == 250L)
    assert(m(2L).getLong(3) == 450L)
    assert(m(3L).isNullAt(3))
  }

  test("quality score composes sequential capped adjustments like the reference") {
    val m = quality(
      // RCT (8) + n>=1000 (+1, cap 10) + multicenter (+0.5, cap 10)
      // + double-blind (+0.5, cap 10): 8 -> 9 -> 9.5 -> 10
      (1L, "randomized multicenter double-blind trial, n = 5000"),
      // case report (2) with n < 30: 2 - 1 = 1 -> Low
      (2L, "case report of n = 3"),
      (3L, "meta-analysis, n = 5000")) // 10 + 1 capped at 10
    assert(m(1L).getDouble(6) == 10.0 && m(1L).getString(7) == "High")
    assert(m(2L).getDouble(6) == 1.0 && m(2L).getString(7) == "Low")
    assert(m(3L).getDouble(6) == 10.0)
  }

  test("bias-risk ladder: design overrides text signals; adjusted softens confounding") {
    val m = quality(
      (1L, "double-blind randomized trial"), // RCT + double-blind -> Low
      (2L, "case report with no bias terms"), // case report -> High
      (3L, "cohort study, confounders adjusted"), // adjusted -> Medium
      (4L, "cohort study with selection bias"), // bias, no adjust -> High
      (5L, "cohort study")) // default Medium
    assert(m(1L).getString(8) == "Low")
    assert(m(2L).getString(8) == "High")
    assert(m(3L).getString(8) == "Medium")
    assert(m(4L).getString(8) == "High")
    assert(m(5L).getString(8) == "Medium")
  }
}
