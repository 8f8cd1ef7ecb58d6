package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paper-quality insight extraction — the Spark-native re-expression
  * of the reference's rule-based study-quality assessor (reference:
  * backend/app/core/paper_insights.py:274 extract_quality, :456
  * _detect_study_design, :464 _extract_sample_size; pattern tables at
  * :108 DESIGN_PATTERNS / :141 SAMPLE_PATTERNS; the evidence
  * hierarchy at :19 StudyDesign).
  *
  * Only the deterministic rule-based surface is in scope — the
  * reference's extract_bottom_line (:182) is an LLM call, out of
  * scope like the crawlers. Its strengths/limitations STRING LISTS
  * are descriptive output; the two strengths that feed the score
  * (multicenter, double-blind) ship as boolean columns instead.
  *
  * Scale: one narrow projection over the document scan — regex
  * predicates and CASE ladders, no shuffle, no UDF, whole-stage
  * codegen end to end. At 100 TB this is the ideal operator shape:
  * cost is exactly one pass over the text column.
  */
object Insights {

  /** The evidence hierarchy in the reference's detection order
    * (paper_insights.py:108 — dict iteration order IS the priority:
    * first design whose pattern alternation hits wins). Patterns are
    * lowercase because the reference lowercases the text first
    * (:285); EXPERT_OPINION has no patterns and so, faithfully, can
    * never be detected.
    */
  private val designLadder: Seq[(String, Int, String)] = Seq(
    ("Meta-Analysis", 10,
      "meta-analysis|meta analysis|pooled analysis"),
    ("Systematic Review", 9,
      "systematic review|systematic literature review"),
    ("Randomized Controlled Trial", 8,
      "randomized|randomised|rct|phase [iv123]+|double-blind|" +
        "placebo-controlled|clinical trial"),
    ("Cohort Study", 6,
      "cohort study|prospective study|retrospective study|" +
        "longitudinal|follow-up study"),
    ("Case-Control", 5, "case-control|case control"),
    ("Cross-Sectional", 4,
      "cross-sectional|cross sectional|prevalence study"),
    ("Case Series", 3,
      "case series|consecutive patients|patient series"),
    ("Case Report", 2, "case report|case presentation"),
    ("In Vitro/Animal", 0,
      "in vitro|cell line|mouse model|animal model|xenograft|" +
        "preclinical"))

  /** Sample-size extraction order (paper_insights.py:141): first
    * pattern whose captured integer parses AND lies in 1..10⁶ wins;
    * an out-of-range hit falls through to the NEXT pattern, exactly
    * like the reference's `continue`.
    */
  private val samplePatterns: Seq[String] = Seq(
    "n\\s*=\\s*(\\d+)", "(\\d+)\\s*patients", "(\\d+)\\s*participants",
    "(\\d+)\\s*subjects", "sample size of\\s*(\\d+)",
    "enrolled\\s*(\\d+)", "included\\s*(\\d+)", "(\\d+)\\s*individuals")

  /** Study-quality row per document: design label + evidence score
    * (the hierarchy base), extracted sample size, the reference's
    * sequentially capped quality score (sample-size adjust, then
    * multicenter +0.5, then double-blind +0.5 — each min(10, ·) in
    * ORDER, so the caps compose exactly as the Python does),
    * High/Medium/Low quality label (≥8 / ≥5), and the bias-risk
    * ladder (:330-336). All score steps are exact multiples of 0.5 —
    * no cross-engine rounding hazard anywhere.
    */
  def paperQuality(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = lower(col(textCol))
    val design = designLadder.foldRight(lit("Unknown")) {
      case ((label, _, pat), rest) => when(t.rlike(pat), lit(label))
        .otherwise(rest)
    }
    val designScore = designLadder.foldRight(lit(0)) {
      case ((_, score, pat), rest) => when(t.rlike(pat), lit(score))
        .otherwise(rest)
    }
    val sampleSize = coalesce(samplePatterns.map { p =>
      // regexp_extract yields '' on no match — nullif before the cast
      // (ANSI mode refuses ''::BIGINT, and the oracle twin does the same)
      val n = nullif(regexp_extract(t, p, 1), lit("")).cast("long")
      when(n.between(1L, 1000000L), n)
    }: _*)
    val multicenter = t.contains("multicenter") || t.contains("multi-center")
    val doubleBlind = t.contains("double-blind")
    docs
      .select(col(idCol), t.as("t"), design.as("design"),
        designScore.cast("long").as("design_score"),
        sampleSize.as("sample_size"), multicenter.as("multicenter"),
        doubleBlind.as("double_blind"))
      .withColumn("q1",
        when(col("sample_size") >= 1000,
          least(lit(10.0), col("design_score") + 1.0))
          .when(col("sample_size") >= 100,
            least(lit(10.0), col("design_score") + 0.5))
          .when(col("sample_size") < 30,
            greatest(lit(0.0), col("design_score") - 1.0))
          .otherwise(col("design_score").cast("double")))
      .withColumn("q2",
        when(col("multicenter"), least(lit(10.0), col("q1") + 0.5))
          .otherwise(col("q1")))
      .withColumn("quality_score",
        round(when(col("double_blind"), least(lit(10.0), col("q2") + 0.5))
          .otherwise(col("q2")), 1))
      .withColumn("quality_label",
        when(col("quality_score") >= 8.0, lit("High"))
          .when(col("quality_score") >= 5.0, lit("Medium"))
          .otherwise(lit("Low")))
      .withColumn("bias_risk",
        when(col("design").isin("Randomized Controlled Trial",
          "Meta-Analysis") && col("double_blind"), lit("Low"))
          .when(col("design").isin("Case Report", "Case Series"),
            lit("High"))
          .when(col("t").contains("bias") || col("t").contains("confound"),
            when(col("t").contains("adjusted"), lit("Medium"))
              .otherwise(lit("High")))
          .otherwise(lit("Medium")))
      .select(col(idCol), col("design"), col("design_score"),
        col("sample_size"), col("multicenter"), col("double_blind"),
        col("quality_score"), col("quality_label"), col("bias_risk"))
  }
}
