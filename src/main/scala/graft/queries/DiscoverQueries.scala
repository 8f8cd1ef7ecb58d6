package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Discover

/** Dynamic-trends route bound to the synthetic corpus (reference:
  * backend/app/api/routes/dynamic_trends.py). The priority panel is
  * a corpus stand-in ("vector" unigram + "slow scan" bigram) so the
  * 2× boost, the trigram priority rule, the rising signal and the
  * starts/ends-with-stopword exception all fire; the two growth
  * periods are overlapping doc_id thirds with period-exclusive
  * marker tokens so emerging / declining / stable buckets and both
  * is_emerging branches are live at sf0.01.
  */
object DiscoverQueries {

  private val Stopwords = Seq("the", "table", "data", "value", "group")
  private val BigramStopwords = Seq("the table", "the row")
  private val Priority = Seq("vector", "slow scan")

  private val Panel = Discover.DiscoverPanel(
    Stopwords, BigramStopwords, Priority)

  private def stopIn = Stopwords.map(w => s"'$w'").mkString(", ")
  private def prioritySql(e: String) =
    Priority.map(t => s"contains($e, '$t')").mkString(" OR ")

  /* ---------------- trend_discover ---------------- */

  private def trendDiscover(s: SparkSession, d: String): DataFrame =
    Discover.discover(Tables.documents(s, d), "doc_id", "text", Panel,
      topN = 30)

  private val trendDiscoverSql = {
    val bigramStopIn = BigramStopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+')
       |    AS t
       |  FROM documents),
       |uf AS (
       |  SELECT doc_id, keyword FROM (
       |    SELECT doc_id, unnest(t) AS keyword FROM toks)
       |  WHERE length(keyword) >= 3 AND keyword NOT IN ($stopIn)),
       |ix2 AS (SELECT doc_id, t,
       |    unnest(generate_series(1, len(t) - 1)) AS i FROM toks),
       |bf AS (
       |  SELECT doc_id, keyword FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i+1] AS keyword,
       |      t[i] AS w1, t[i+1] AS w2 FROM ix2)
       |  WHERE length(keyword) >= 6
       |    AND (w1 NOT IN ($stopIn) OR w2 NOT IN ($stopIn))),
       |ix3 AS (SELECT doc_id, t,
       |    unnest(generate_series(1, len(t) - 2)) AS i FROM toks),
       |tf AS (
       |  SELECT doc_id, keyword FROM (
       |    SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
       |      AS keyword FROM ix3)
       |  WHERE ${prioritySql("keyword")}),
       |allk AS (
       |  SELECT * FROM uf UNION ALL SELECT * FROM bf
       |  UNION ALL SELECT * FROM tf),
       |g AS (
       |  SELECT keyword, count(*)::BIGINT AS frequency,
       |    count(DISTINCT doc_id)::BIGINT AS nd
       |  FROM allk GROUP BY 1),
       |f AS (
       |  SELECT * FROM g
       |  WHERE frequency >= 3
       |    AND NOT regexp_matches(keyword, '^[0-9]+$$')
       |    AND length(keyword) >= 4
       |    AND keyword NOT IN ($stopIn)
       |    AND keyword NOT IN ($bigramStopIn)
       |    AND (len(string_split(keyword, ' ')) < 2
       |      OR NOT (string_split(keyword, ' ')[1] IN ($stopIn)
       |        OR string_split(keyword, ' ')[-1] IN ($stopIn))
       |      OR ${prioritySql("keyword")}))
       |SELECT keyword, frequency, least(3, nd)::BIGINT AS paper_count,
       |  CASE WHEN ${prioritySql("keyword")} THEN 'rising'
       |    WHEN frequency >= 10 THEN 'stable'
       |    ELSE 'new' END AS growth_signal,
       |  (frequency * CASE WHEN ${prioritySql("keyword")} THEN 2
       |    ELSE 1 END)::BIGINT AS score
       |FROM f
       |ORDER BY score DESC, keyword
       |LIMIT 30""".stripMargin
  }

  /* ---------------- kw_growth ---------------- */

  private def unigramCounts(
      frame: DataFrame, countAs: String): DataFrame =
    frame
      .select(explode(graft.functions.TextFns.wsTokens(col("t")))
        .as("keyword"))
      .where(length(col("keyword")) >= 3)
      .groupBy(col("keyword")).agg(count(lit(1)).as(countAs))

  private def kwGrowth(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val recent = docs.where(pmod(col("doc_id"), lit(3)) < 2)
      .select(concat(col("text"),
        when(pmod(col("doc_id"), lit(10)) === 1, lit(" growmark"))
          .otherwise(lit(""))).as("t"))
    val previous = docs.where(pmod(col("doc_id"), lit(3)) >= 1)
      .select(concat(col("text"),
        when(pmod(col("doc_id"), lit(10)) === 2, lit(" fademark"))
          .otherwise(lit(""))).as("t"))
    Discover.growthAnalysis(
      unigramCounts(recent, "recent_count"),
      unigramCounts(previous, "previous_count"), Stopwords)
      .orderBy(col("bucket"), col("rnk"))
  }

  private def periodCteSql(
      name: String, cond: String, markCond: String,
      mark: String, countAs: String): String =
    s"""$name AS (
       |  SELECT keyword, count(*)::BIGINT AS $countAs FROM (
       |    SELECT unnest(string_split_regex(lower(trim(text ||
       |      (CASE WHEN $markCond THEN ' $mark' ELSE '' END))),
       |      '\\s+')) AS keyword
       |    FROM documents WHERE $cond)
       |  WHERE length(keyword) >= 3 GROUP BY 1)""".stripMargin

  private val kwGrowthSql =
    s"""WITH ${periodCteSql("rc", "doc_id % 3 < 2", "doc_id % 10 = 1",
        "growmark", "recent_count")},
       |${periodCteSql("pc", "doc_id % 3 >= 1", "doc_id % 10 = 2",
        "fademark", "previous_count")},
       |j AS (
       |  SELECT coalesce(rc.keyword, pc.keyword) AS keyword,
       |    coalesce(rc.recent_count, 0)::BIGINT AS recent_count,
       |    coalesce(pc.previous_count, 0)::BIGINT AS previous_count
       |  FROM rc FULL OUTER JOIN pc ON rc.keyword = pc.keyword),
       |f AS (
       |  SELECT *,
       |    CASE WHEN previous_count > 0
       |      THEN (recent_count - previous_count) / previous_count
       |        * 100.0
       |      ELSE (CASE WHEN recent_count > 0 THEN 100.0 ELSE 0.0 END)
       |    END AS raw_rate
       |  FROM j
       |  WHERE keyword NOT IN ($stopIn) AND length(keyword) >= 4
       |    AND (recent_count >= 2 OR previous_count >= 2)),
       |b AS (
       |  SELECT *,
       |    CASE WHEN raw_rate > 30 THEN 'emerging'
       |      WHEN raw_rate < -30 THEN 'declining'
       |      ELSE 'stable' END AS bucket,
       |    (recent_count > 0 AND previous_count = 0) OR raw_rate > 50
       |      AS is_emerging
       |  FROM f),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY
       |      CASE WHEN bucket = 'emerging' THEN -raw_rate
       |        WHEN bucket = 'declining' THEN raw_rate
       |        ELSE -(recent_count::DOUBLE) END,
       |      keyword)::BIGINT AS rnk
       |  FROM b)
       |SELECT bucket, keyword, recent_count, previous_count,
       |  round(raw_rate + 1e-9, 1) AS growth_rate, is_emerging, rnk
       |FROM r WHERE rnk <= 15
       |ORDER BY bucket, rnk""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("trend_discover", trendDiscover, Some(trendDiscoverSql)),
    Qdef("kw_growth", kwGrowth, Some(kwGrowthSql)))
}
