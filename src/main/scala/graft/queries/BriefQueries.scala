package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Trends

/** Daily-briefing hybrid trend tracks bound to the synthetic corpus
  * (reference: bio-daily-briefing/src/trend_analyzer.py:293
  * analyze_hybrid). The reference compares today's fetch against
  * JSON history files from yesterday / a week ago; the binding
  * synthesizes those as residue-class corpus slices with marker
  * tokens appended per slice, chosen so every change-label rung
  * (surge via the week=0 branch, up, steady, down), the min-papers
  * drop, and both emerging flavors (new, rising) fire at sf0.01.
  */
object BriefQueries {

  /** (condition-SQL, marker) pairs appended to TODAY's text. */
  private val TodayMarks = Seq(
    ("doc_id % 3 <> 0", "surgemark"),
    ("doc_id % 2 = 0", "upmark"),
    ("doc_id % 3 = 0", "steadmark"),
    ("doc_id % 25 = 1", "declmark"),
    ("doc_id % 250 = 7", "raremark"),
    ("doc_id % 20 = 7", "novamark"),
    ("doc_id % 40 = 3", "risemark"))

  /** Topic panel: name → keywords, matched with the reference's
    * _is_word_match (≤4 chars → word boundary, else substring).
    */
  private val Topics = Seq(
    "aggregation" -> Seq("agg", "window agg"),
    "surging" -> Seq("surgemark"),
    "upward" -> Seq("upmark"),
    "steady_state" -> Seq("steadmark"),
    "fading" -> Seq("declmark"),
    "rare" -> Seq("raremark"))

  private val PredefinedKeywords = Topics.flatMap(_._2)

  private def todayText: Column =
    TodayMarks.foldLeft(col("text")) { case (acc, (cond, mark)) =>
      concat(acc, when(expr(cond), lit(" " + mark)).otherwise(lit("")))
    }

  private val todayTextSql = "text" + TodayMarks.map { case (c, m) =>
    s" || (CASE WHEN $c THEN ' $m' ELSE '' END)"
  }.mkString

  /** _is_word_match (trend_analyzer.py:419): boundary regex for
    * short keywords, substring for longer ones.
    */
  private def kwMatch(text: Column, kw: String): Column =
    if (kw.length <= 4)
      text.rlike("\\b" + java.util.regex.Pattern.quote(kw) + "\\b")
    else text.contains(kw)

  private def kwMatchSql(textExpr: String, kw: String): String =
    if (kw.length <= 4) s"regexp_matches($textExpr, '\\b$kw\\b')"
    else s"contains($textExpr, '$kw')"

  /** Per-topic paper counts over one frame: a single conditional-agg
    * pass exploded to (name, count) rows — the Gaps shape.
    */
  private def topicCounts(
      frame: DataFrame, countAs: String): DataFrame = {
    val aggs = Topics.map { case (name, kws) =>
      sum(when(kws.map(k => kwMatch(col("t"), k)).reduce(_ || _), 1L)
        .otherwise(0L)).as(s"c_$name")
    }
    val one = frame.agg(aggs.head, aggs.tail: _*)
    val rows = Topics.map { case (name, _) =>
      struct(lit(name).as("name"), col(s"c_$name").as(countAs))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  private def topicCountsSql(
      fromCte: String, countAs: String): String = {
    val sums = Topics.map { case (name, kws) =>
      val cond = kws.map(k => kwMatchSql("t", k)).mkString(" OR ")
      s"sum(CASE WHEN $cond THEN 1 ELSE 0 END)::BIGINT AS c_$name"
    }.mkString(",\n      ")
    val unions = Topics.map { case (name, _) =>
      s"SELECT '$name' AS name, c_$name AS $countAs FROM agg_$fromCte"
    }.mkString("\n    UNION ALL ")
    s"""agg_$fromCte AS (
       |    SELECT $sums
       |    FROM $fromCte),
       |  tc_$fromCte AS (
       |    $unions)""".stripMargin
  }

  /* ---------------- brief_predef ---------------- */

  private def briefPredef(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val today = docs.select(col("doc_id"), todayText.as("t"))
    // week-ago history: the %3=0 slice carrying the up/steady/down
    // markers on every doc (a week ago those topics were bigger)
    val week = docs.where(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" upmark steadmark declmark")).as("t"))
    Trends.predefinedTrends(
      topicCounts(today, "count"),
      topicCounts(week, "week_count"), "name")
  }

  private val briefPredefSql =
    s"""WITH today AS (
       |    SELECT doc_id, $todayTextSql AS t FROM documents),
       |  week AS (
       |    SELECT doc_id, text || ' upmark steadmark declmark' AS t
       |    FROM documents WHERE doc_id % 3 = 0),
       |  ${topicCountsSql("today", "count")},
       |  ${topicCountsSql("week", "week_count")},
       |  j AS (
       |    SELECT t1.name, t1.count,
       |      coalesce(t2.week_count, 0)::BIGINT AS week_ago_count
       |    FROM tc_today t1 LEFT JOIN tc_week t2 ON t1.name = t2.name
       |    WHERE t1.count >= 5),
       |  ch AS (
       |    SELECT *,
       |      CASE WHEN week_ago_count = 0
       |        THEN (CASE WHEN count > 0 THEN 100.0 ELSE 0.0 END)
       |        ELSE (count - week_ago_count) / week_ago_count * 100.0
       |      END AS raw_change,
       |      row_number() OVER (ORDER BY count DESC, name)::BIGINT
       |        AS rnk
       |    FROM j)
       |SELECT name, count, week_ago_count,
       |  round(raw_change + 1e-9, 1) AS week_change,
       |  CASE WHEN raw_change >= 50 THEN 'surge'
       |    WHEN raw_change >= 10 THEN 'up'
       |    WHEN raw_change <= -10 THEN 'down'
       |    ELSE 'steady' END AS change_label,
       |  rnk
       |FROM ch WHERE rnk <= 5
       |ORDER BY rnk""".stripMargin

  /* ---------------- brief_emerging ---------------- */

  private def tokenCounts(frame: DataFrame, countAs: String): DataFrame =
    frame
      .select(explode(array_distinct(
        regexp_extract_all(col("t"), lit("[a-z]{3,}"), lit(0))))
        .as("keyword"))
      .where(!col("keyword").isInCollection(Trends.trendStopwords))
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as(countAs))

  private def briefEmerging(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val today = docs.select(col("doc_id"), todayText.as("t"))
    // yesterday history: a 60% slice — wide enough that the organic
    // vocabulary's today/yesterday ratio lands under the 2× rising
    // cut, so the emerging list is the marker signal, not the whole
    // vocabulary — with risemark on a 5-doc residue class (clears
    // the is_new cut and sets up the ≥2× rise)
    val yesterday = docs.where(pmod(col("doc_id"), lit(5)) < 3)
      .select(col("doc_id"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(100)) === 2, lit(" risemark"))
            .otherwise(lit(""))).as("t"))
    Trends.emergingTrends(
      tokenCounts(today, "count"),
      tokenCounts(yesterday, "prev_count"),
      PredefinedKeywords, maxN = 10)
  }

  private val briefEmergingSql = {
    val stop = Trends.trendStopwords.map(w => s"'$w'").mkString(", ")
    val predef2 = PredefinedKeywords.map(_.toLowerCase).map(p =>
      s"contains(t1.keyword, '$p') OR contains('$p', t1.keyword)")
      .mkString(" OR ")
    s"""WITH today AS (
       |    SELECT doc_id, $todayTextSql AS t FROM documents),
       |  yesterday AS (
       |    SELECT doc_id, text ||
       |      (CASE WHEN doc_id % 100 = 2 THEN ' risemark' ELSE '' END)
       |      AS t
       |    FROM documents WHERE doc_id % 5 < 3),
       |  tk_today AS (
       |    SELECT keyword, count(*)::BIGINT AS count FROM (
       |      SELECT doc_id, unnest(list_distinct(
       |        regexp_extract_all(t, '[a-z]{3,}'))) AS keyword
       |      FROM today)
       |    WHERE keyword NOT IN ($stop) GROUP BY 1),
       |  tk_yest AS (
       |    SELECT keyword, count(*)::BIGINT AS prev_count FROM (
       |      SELECT doc_id, unnest(list_distinct(
       |        regexp_extract_all(t, '[a-z]{3,}'))) AS keyword
       |      FROM yesterday)
       |    WHERE keyword NOT IN ($stop) GROUP BY 1),
       |  j AS (
       |    SELECT t1.keyword, t1.count,
       |      coalesce(t2.prev_count, 0)::BIGINT AS previous_count
       |    FROM tk_today t1 LEFT JOIN tk_yest t2
       |      ON t1.keyword = t2.keyword
       |    WHERE t1.count >= 5 AND NOT ($predef2)),
       |  f AS (
       |    SELECT *, previous_count < 3 AS is_new
       |    FROM j
       |    WHERE previous_count < 3
       |      OR count / previous_count >= 2.0)
       |SELECT keyword, count, previous_count, is_new,
       |  CASE WHEN is_new THEN 'new' ELSE 'rising' END AS change_label
       |FROM f
       |ORDER BY count DESC, keyword
       |LIMIT 10""".stripMargin
  }

  val defs: Seq[Qdef] = Seq(
    Qdef("brief_predef", briefPredef, Some(briefPredefSql)),
    Qdef("brief_emerging", briefEmerging, Some(briefEmergingSql)))
}
