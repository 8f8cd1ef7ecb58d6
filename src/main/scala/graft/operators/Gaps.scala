package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Research-gap analytics — re-expression of the reference's
  * research-gaps route (reference:
  * backend/app/api/routes/research_gaps.py:77 GAP_PATTERNS — regex
  * indicator families per gap type; :272 calculate_priority_score —
  * ratio/evidence/volume ladder blend; :304 analyze_research_gaps —
  * per-type evidence counts + ratios; :381 find_understudied_areas —
  * topic×modifier coverage ratios; :508 get_opportunity_matrix —
  * gap-type distribution). The reference counts via PubMed esearch
  * HTTP calls; here the corpus IS the literature, so every count is
  * a conditional aggregate over one scan.
  *
  * Scale shape: each analysis is a SINGLE full scan producing one
  * small row of conditional sums (map-side combined), then an
  * explode of that row into per-type/per-modifier rows — corpus
  * traffic is one pass, result traffic is panel-sized. No join
  * against the corpus, nothing collected.
  */
object Gaps {

  /** One gap family: type name + its indicator regexes (a doc is
    * evidence if ANY pattern matches, like the reference's OR'd
    * esearch terms).
    */
  case class GapPanel(types: Seq[(String, Seq[String])])

  private def matchesAny(text: Column, patterns: Seq[String]): Column =
    patterns.map(p => text.rlike(p)).reduce(_ || _)

  /** Priority-score ladder (research_gaps.py:272): 0.4·min(100,
    * ratio·1000) + 0.35·evidence-rung (<5→30, <20→80, <50→60,
    * else 40) + 0.25·volume-rung (<100→90, <500→70, <2000→50,
    * else 30), rounded to 1dp. The reference feeds the UNROUNDED
    * ratio into the ladder and rounds only the published ratio —
    * mirrored here.
    */
  def priorityScore(
      gapRatio: Column, evidence: Column, total: Column): Column = {
    val ratioScore = least(lit(100.0), gapRatio * 1000.0)
    val evidenceScore = when(evidence < 5, 30.0)
      .when(evidence < 20, 80.0).when(evidence < 50, 60.0)
      .otherwise(40.0)
    val volumeScore = when(total < 100, 90.0).when(total < 500, 70.0)
      .when(total < 2000, 50.0).otherwise(30.0)
    round(ratioScore * 0.4 + evidenceScore * 0.35 + volumeScore * 0.25
      + lit(1e-9), 1)
  }

  /** Per-gap-type evidence counts, ratios and priority scores
    * (analyze_research_gaps): one conditional-agg pass over the
    * corpus, exploded to a row per gap type, sorted by priority.
    */
  def analyze(
      docs: DataFrame, textCol: String, panel: GapPanel): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("total") +:
      panel.types.map { case (name, pats) =>
        sum(when(matchesAny(col(textCol), pats), 1L).otherwise(0L))
          .as(s"ev_$name")
      }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val typeRows = panel.types.map { case (name, _) =>
      struct(lit(name).as("gap_type"), col(s"ev_$name").as("evidence"))
    }
    one.select(col("total"), explode(array(typeRows: _*)).as("g"))
      .select(lit("corpus").as("topic"), col("g.gap_type"),
        col("g.evidence").as("evidence_count"),
        col("total").as("total_papers"),
        round(col("g.evidence") / greatest(lit(1L), col("total"))
          + lit(1e-9), 4).as("gap_ratio"),
        priorityScore(
          col("g.evidence") / greatest(lit(1L), col("total")),
          col("g.evidence"), col("total")).as("priority_score"))
      .orderBy(col("priority_score").desc, col("gap_type"))
  }

  /** Understudied sub-areas (find_understudied_areas): for each
    * modifier, coverage = |docs with base AND modifier| / |docs with
    * base|; keep coverage < maxCoverage with at least minCombined
    * hits; opportunity = (1 − coverage)·100. Matching is substring
    * containment (the reference's AND'd esearch terms). Same
    * single-scan + explode shape as [[analyze]].
    */
  def understudied(
      docs: DataFrame, textCol: String, baseTerm: String,
      modifiers: Seq[String], minCombined: Long = 10,
      maxCoverage: Double = 0.05): DataFrame = {
    val base = col(textCol).contains(baseTerm)
    val aggs = sum(when(base, 1L).otherwise(0L)).as("base_count") +:
      modifiers.zipWithIndex.map { case (m, i) =>
        sum(when(base && col(textCol).contains(m), 1L).otherwise(0L))
          .as(s"c_$i")
      }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val modRows = modifiers.zipWithIndex.map { case (m, i) =>
      struct(lit(m).as("modifier"), col(s"c_$i").as("combined"))
    }
    one.select(col("base_count"), explode(array(modRows: _*)).as("m"))
      .select(
        concat(lit(baseTerm), lit(" + "), col("m.modifier"))
          .as("topic_combination"),
        col("base_count").as("base_topic_papers"),
        col("m.combined").as("combined_topic_papers"),
        (col("m.combined") / col("base_count")).as("cov"))
      .where(col("cov") < maxCoverage &&
        col("combined_topic_papers") >= minCombined)
      .select(col("topic_combination"), col("base_topic_papers"),
        col("combined_topic_papers"),
        round(col("cov") + lit(1e-9), 4).as("coverage_ratio"),
        round((lit(1.0) - col("cov")) * 100.0 + lit(1e-9), 1)
          .as("opportunity_score"))
      .orderBy(col("opportunity_score").desc, col("topic_combination"))
  }

  /** Emerging research questions (research_gaps.py:436
    * find_emerging_questions): per question pattern, the FIRST match
    * in each doc (the reference's matches[:1]), kept when longer
    * than minLen, templated 'What {match}?', deduplicated on the
    * lowercased question keeping the first occurrence in (doc,
    * pattern-panel) order, first topN kept. One scan with per-row
    * regexp_extract per pattern; dedup partitions on the question
    * key.
    */
  def emergingQuestions(
      docs: DataFrame, idCol: String, textCol: String,
      patterns: Seq[(String, String)], minLen: Int = 20,
      topN: Int = 10): DataFrame = {
    val perPattern = patterns.zipWithIndex.map { case ((pat, qt), i) =>
      docs.select(col(idCol),
        lit(i.toLong).as("panel_idx"), lit(qt).as("question_type"),
        regexp_extract(col(textCol), pat, 0).as("m"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lower(col("question")))
      .orderBy(col(idCol), col("panel_idx"))
    perPattern.reduce(_ unionAll _)
      .where(length(col("m")) > minLen)
      .withColumn("question", concat(lit("What "), col("m"), lit("?")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .orderBy(col(idCol), col("panel_idx"))
      .limit(topN)
      .select(col(idCol), col("question_type"), col("question"),
        lit(0.7).as("relevance"))
  }

  /** Opportunity matrix (get_opportunity_matrix): per gap type the
    * count of docs matching the topic AND the type's FIRST pattern
    * (the reference queries `topic AND "patterns[0][:25]"`),
    * percentage of the topic total, and the top-opportunity flag
    * (max count, first-in-panel-order tie-break like Python's max).
    */
  def matrix(
      docs: DataFrame, textCol: String, topicTerm: String,
      panel: GapPanel): DataFrame = {
    val topic = col(textCol).contains(topicTerm)
    val aggs =
      sum(when(topic, 1L).otherwise(0L)).as("total") +:
      panel.types.map { case (name, pats) =>
        sum(when(topic && col(textCol).rlike(pats.head), 1L)
          .otherwise(0L)).as(s"c_$name")
      }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val typeRows = panel.types.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("gap_type"), col(s"c_$name").as("cnt"),
        lit(i.toLong).as("panel_idx"))
    }
    one.select(col("total"), explode(array(typeRows: _*)).as("g"))
      .select(col("g.gap_type"), col("g.cnt").as("count"),
        round(col("g.cnt") / greatest(lit(1L), col("total")) * 100.0
          + lit(1e-9), 2).as("percentage"),
        col("total").as("total_papers"), col("g.panel_idx"))
      .withColumn("is_top",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("count").desc, col("panel_idx"))) === 1)
      .select(col("gap_type"), col("count"), col("percentage"),
        col("total_papers"), col("is_top"))
      .orderBy(col("count").desc, col("gap_type"))
  }
}
