package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.operators.Gaps

/** Research-gap analytics bound to the synthetic corpus (reference:
  * backend/app/api/routes/research_gaps.py). The reference's PubMed
  * esearch counts become conditional aggregates over documents; the
  * gap-indicator regexes are corpus-vocabulary stand-ins chosen so
  * the evidence ladder hits three different rungs at sf0.01
  * (~88 / ~27 / ~16 / ~26 docs of 500).
  */
object GapQueries {

  private val DemoPanel = Gaps.GapPanel(Seq(
    "future_research" -> Seq("slow (scan|sort)", "slow query"),
    "unclear_mechanism" -> Seq("hash join"),
    "lacking_data" -> Seq("part key"),
    "emerging_question" -> Seq("dup", "value hash value")))

  /** Understudied-modifier panel: bigrams whose co-occurrence with
    * the base term straddles the reference's <5% coverage / ≥10-hit
    * cuts, so both the keep and both drop branches fire.
    */
  private val Modifiers = Seq(
    "big table", "order key", "part key", "key value", "value hash",
    "small table", "window agg", "fast query", "slow scan",
    "sort merge")

  private val priorityLadderSql =
    """round(least(100.0, (evidence_count / greatest(1, total)) * 1000)
      |      * 0.4
      |    + (CASE WHEN evidence_count < 5 THEN 30
      |        WHEN evidence_count < 20 THEN 80
      |        WHEN evidence_count < 50 THEN 60 ELSE 40 END) * 0.35
      |    + (CASE WHEN total < 100 THEN 90 WHEN total < 500 THEN 70
      |        WHEN total < 2000 THEN 50 ELSE 30 END) * 0.25
      |    + 1e-9, 1)""".stripMargin

  /* ---------------- gap_analyze ---------------- */

  private def gapAnalyze(s: SparkSession, d: String): DataFrame =
    Gaps.analyze(Tables.documents(s, d), "text", DemoPanel)

  private val gapAnalyzeSql = {
    val evSums = DemoPanel.types.map { case (name, pats) =>
      val cond = pats.map(p => s"regexp_matches(text, '$p')")
        .mkString(" OR ")
      s"sum(CASE WHEN $cond THEN 1 ELSE 0 END)::BIGINT AS ev_$name"
    }.mkString(",\n    ")
    val unions = DemoPanel.types.map { case (name, _) =>
      s"SELECT '$name' AS gap_type, ev_$name AS evidence_count, total FROM g"
    }.mkString("\n  UNION ALL ")
    s"""WITH g AS (
       |  SELECT count(*)::BIGINT AS total,
       |    $evSums
       |  FROM documents),
       |t AS (
       |  $unions)
       |SELECT 'corpus' AS topic, gap_type, evidence_count,
       |  total AS total_papers,
       |  round(evidence_count / greatest(1, total) + 1e-9, 4)
       |    AS gap_ratio,
       |  $priorityLadderSql AS priority_score
       |FROM t
       |ORDER BY priority_score DESC, gap_type""".stripMargin
  }

  /* ---------------- gap_understudied ---------------- */

  private def gapUnderstudied(s: SparkSession, d: String): DataFrame =
    Gaps.understudied(Tables.documents(s, d), "text", "batch",
      Modifiers)

  private val gapUnderstudiedSql = {
    val modSums = Modifiers.zipWithIndex.map { case (m, i) =>
      s"sum(CASE WHEN contains(text, 'batch') AND contains(text, '$m') " +
        s"THEN 1 ELSE 0 END)::BIGINT AS c_$i"
    }.mkString(",\n    ")
    val unions = Modifiers.zipWithIndex.map { case (m, i) =>
      s"SELECT '$m' AS modifier, c_$i AS combined, base_count FROM g"
    }.mkString("\n  UNION ALL ")
    s"""WITH g AS (
       |  SELECT
       |    sum(CASE WHEN contains(text, 'batch') THEN 1 ELSE 0 END)
       |      ::BIGINT AS base_count,
       |    $modSums
       |  FROM documents),
       |t AS (
       |  $unions)
       |SELECT 'batch + ' || modifier AS topic_combination,
       |  base_count AS base_topic_papers,
       |  combined AS combined_topic_papers,
       |  round(combined / base_count + 1e-9, 4) AS coverage_ratio,
       |  round((1.0 - combined / base_count) * 100.0 + 1e-9, 1)
       |    AS opportunity_score
       |FROM t
       |WHERE combined / base_count < 0.05 AND combined >= 10
       |ORDER BY opportunity_score DESC, topic_combination""".stripMargin
  }

  /* ---------------- gap_matrix ---------------- */

  private def gapMatrix(s: SparkSession, d: String): DataFrame =
    Gaps.matrix(Tables.documents(s, d), "text", "batch", DemoPanel)

  private val gapMatrixSql = {
    val cSums = DemoPanel.types.map { case (name, pats) =>
      s"sum(CASE WHEN contains(text, 'batch') " +
        s"AND regexp_matches(text, '${pats.head}') " +
        s"THEN 1 ELSE 0 END)::BIGINT AS c_$name"
    }.mkString(",\n    ")
    val unions = DemoPanel.types.zipWithIndex.map { case ((name, _), i) =>
      s"SELECT '$name' AS gap_type, c_$name AS cnt, $i AS panel_idx, " +
        s"total FROM g"
    }.mkString("\n  UNION ALL ")
    s"""WITH g AS (
       |  SELECT
       |    sum(CASE WHEN contains(text, 'batch') THEN 1 ELSE 0 END)
       |      ::BIGINT AS total,
       |    $cSums
       |  FROM documents),
       |t AS (
       |  $unions),
       |r AS (
       |  SELECT gap_type, cnt AS count,
       |    round(cnt / greatest(1, total) * 100.0 + 1e-9, 2)
       |      AS percentage,
       |    total AS total_papers,
       |    row_number() OVER (ORDER BY cnt DESC, panel_idx) = 1
       |      AS is_top
       |  FROM t)
       |SELECT * FROM r
       |ORDER BY count DESC, gap_type""".stripMargin
  }

  /* ---------------- gap_questions ---------------- */

  /** Question-pattern panel (research_gaps.py:466 question_patterns
    * stand-ins): bounded {6,30} middles so the >20-char cut bites —
    * short matches drop, long ones template into questions.
    */
  private val QuestionPatterns = Seq(
    ("slow [a-z ]{6,30} scan", "exploratory"),
    ("hash [a-z ]{6,30} value", "mechanism"),
    ("merge [a-z ]{6,30} sort", "functional"),
    ("window [a-z ]{6,30} agg", "optimization"),
    ("fast [a-z ]{6,30} query", "clinical"))

  private def gapQuestions(s: SparkSession, d: String): DataFrame =
    Gaps.emergingQuestions(Tables.documents(s, d), "doc_id", "text",
      QuestionPatterns)

  private val gapQuestionsSql = {
    val unions = QuestionPatterns.zipWithIndex.map {
      case ((pat, qt), i) =>
        s"SELECT doc_id, $i AS panel_idx, '$qt' AS question_type, " +
          s"regexp_extract(text, '$pat') AS m FROM documents"
    }.mkString("\n  UNION ALL ")
    s"""WITH q AS (
       |  $unions),
       |f AS (
       |  SELECT doc_id, panel_idx, question_type,
       |    'What ' || m || '?' AS question
       |  FROM q WHERE length(m) > 20),
       |d AS (
       |  SELECT *, row_number() OVER (PARTITION BY lower(question)
       |    ORDER BY doc_id, panel_idx) AS rn FROM f),
       |s AS (
       |  SELECT doc_id, question_type, question FROM d
       |  WHERE rn = 1 ORDER BY doc_id, panel_idx LIMIT 10)
       |SELECT doc_id, question_type, question,
       |  0.7::DOUBLE AS relevance
       |FROM s""".stripMargin
  }

  val defs: Seq[Qdef] = Seq(
    Qdef("gap_analyze", gapAnalyze, Some(gapAnalyzeSql)),
    Qdef("gap_understudied", gapUnderstudied, Some(gapUnderstudiedSql)),
    Qdef("gap_matrix", gapMatrix, Some(gapMatrixSql)),
    Qdef("gap_questions", gapQuestions, Some(gapQuestionsSql)))
}
