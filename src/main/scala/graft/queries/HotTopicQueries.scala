package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TrendScore

/** Trends-route analytics bound to the synthetic corpus (reference:
  * backend/app/api/routes/trends.py). The per-keyword PubMed /
  * ClinicalTrials metrics are derived from the corpus in ONE
  * conditional-agg pass (current/previous = doc_id parity slices)
  * with per-keyword scale multipliers [1, 10, 50] restoring the
  * reference's dynamic range (the corpus is PubMed at 1/Nth scale),
  * plus deterministic trial counts / citation velocities so every
  * ladder rung that can fire at this scale does.
  */
object HotTopicQueries {

  /** (keyword, multiplier, clinical_trials, citation_velocity). */
  private val HotPanel: Seq[(String, Int, Int, Double)] =
    Seq("batch", "slow query", "part key", "hash join", "merge sort",
      "dup", "vector", "key value", "filter scan")
      .zipWithIndex.map { case (kw, i) =>
        (kw, Seq(1, 10, 50)(i % 3), (i * 31) % 130, 30.0 + i * 27.5)
      }

  /* ---------------- hot_enhanced ---------------- */

  private def hotMetrics(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val aggs = HotPanel.zipWithIndex.flatMap { case ((kw, m, _, _), i) =>
      val hit = col("text").contains(kw)
      val odd = pmod(col("doc_id"), lit(2)) === 1
      Seq(
        (sum(when(hit && odd, 1L).otherwise(0L)) * m).as(s"cur_$i"),
        (sum(when(hit && !odd, 1L).otherwise(0L)) * m).as(s"prev_$i"),
        (sum(when(hit && col("text").contains("dup"), 1L)
          .otherwise(0L)) * m).as(s"fut_$i"))
    }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val rows = HotPanel.zipWithIndex.map { case ((kw, _, ct, cv), i) =>
      struct(lit(kw).as("keyword"),
        col(s"cur_$i").as("current_papers"),
        col(s"prev_$i").as("previous_papers"),
        lit(ct.toLong).as("clinical_trials"),
        col(s"fut_$i").as("future_mentions"),
        lit(cv).as("citation_velocity"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  private def hotEnhanced(s: SparkSession, d: String): DataFrame =
    TrendScore.enhanced(hotMetrics(s, d))

  private val hotEnhancedSql = {
    val sums = HotPanel.zipWithIndex.flatMap { case ((kw, m, _, _), i) =>
      Seq(
        s"(sum(CASE WHEN contains(text, '$kw') AND doc_id % 2 = 1 " +
          s"THEN 1 ELSE 0 END)::BIGINT * $m) AS cur_$i",
        s"(sum(CASE WHEN contains(text, '$kw') AND doc_id % 2 = 0 " +
          s"THEN 1 ELSE 0 END)::BIGINT * $m) AS prev_$i",
        s"(sum(CASE WHEN contains(text, '$kw') AND contains(text, " +
          s"'dup') THEN 1 ELSE 0 END)::BIGINT * $m) AS fut_$i")
    }.mkString(",\n    ")
    val unions = HotPanel.zipWithIndex.map { case ((kw, _, ct, cv), i) =>
      s"SELECT '$kw' AS keyword, cur_$i AS current_papers, " +
        s"prev_$i AS previous_papers, ${ct}::BIGINT AS clinical_trials, " +
        s"fut_$i AS future_mentions, ${cv}::DOUBLE AS citation_velocity " +
        s"FROM g"
    }.mkString("\n  UNION ALL ")
    s"""WITH g AS (
       |  SELECT
       |    $sums
       |  FROM documents),
       |m AS (
       |  $unions),
       |raw AS (
       |  SELECT *,
       |    CASE WHEN previous_papers > 0
       |      THEN (current_papers - previous_papers)
       |        / previous_papers * 100.0
       |      ELSE (CASE WHEN current_papers > 0 THEN 100.0
       |        ELSE 0.0 END) END AS growth_raw,
       |    current_papers + previous_papers AS tot
       |  FROM m),
       |dim AS (
       |  SELECT *,
       |    CASE WHEN growth_raw >= 50 THEN 100.0
       |      WHEN growth_raw >= 30 THEN 80.0 + (growth_raw - 30) * 1.0
       |      WHEN growth_raw >= 15 THEN 60.0 + (growth_raw - 15) * 1.33
       |      WHEN growth_raw >= 5 THEN 40.0 + (growth_raw - 5) * 2.0
       |      WHEN growth_raw >= 0 THEN 20.0 + growth_raw * 4.0
       |      ELSE greatest(0.0, 20.0 + growth_raw) END AS rising_raw,
       |    least(100.0, least(100.0, citation_velocity / 2)
       |      + CASE WHEN tot >= 10000 THEN 30.0
       |          WHEN tot >= 5000 THEN 20.0
       |          WHEN tot >= 1000 THEN 10.0 ELSE 0.0 END)
       |      AS interest_raw,
       |    least(100.0,
       |      CASE WHEN current_papers >= 5000 THEN 50.0
       |        WHEN current_papers >= 1000 THEN 40.0
       |        WHEN current_papers >= 500 THEN 30.0
       |        WHEN current_papers >= 100 THEN 20.0 ELSE 10.0 END
       |      + CASE WHEN clinical_trials >= 100 THEN 50.0
       |          WHEN clinical_trials >= 50 THEN 40.0
       |          WHEN clinical_trials >= 20 THEN 30.0
       |          WHEN clinical_trials >= 5 THEN 20.0
       |          ELSE clinical_trials * 2.0 END) AS activity_raw,
       |    CASE WHEN tot = 0 THEN 0.0
       |      WHEN future_mentions * 100.0 / tot >= 10 THEN 100.0
       |      WHEN future_mentions * 100.0 / tot >= 5
       |        THEN 70.0 + future_mentions * 100.0 / tot * 3
       |      WHEN future_mentions * 100.0 / tot >= 2
       |        THEN 40.0 + future_mentions * 100.0 / tot * 6
       |      ELSE future_mentions * 100.0 / tot * 20 END AS future_raw
       |  FROM raw),
       |sc AS (
       |  SELECT *,
       |    round(rising_raw + 1e-9, 1) AS rising_score,
       |    round(interest_raw + 1e-9, 1) AS interest_score,
       |    round(activity_raw + 1e-9, 1) AS activity_score,
       |    round(future_raw + 1e-9, 1) AS future_score,
       |    round(rising_raw * 0.30 + interest_raw * 0.25
       |      + activity_raw * 0.25 + future_raw * 0.20 + 1e-9, 1)
       |      AS total_score,
       |    round(growth_raw + 1e-9, 1) AS growth_rate
       |  FROM dim),
       |fin AS (
       |  SELECT *,
       |    CASE WHEN rising_score >= 80 AND total_score >= 70
       |        THEN 'Explosive'
       |      WHEN rising_score >= 60 THEN 'Rising'
       |      WHEN future_score >= 70 AND activity_score < 50
       |        THEN 'Emerging'
       |      WHEN activity_score >= 70 THEN 'Established'
       |      ELSE 'Stable' END AS trend_label,
       |    CASE WHEN activity_raw < 30 AND rising_raw >= 50
       |        THEN 'Early Stage'
       |      WHEN activity_raw >= 30 AND rising_raw >= 30
       |        THEN 'Growth Phase'
       |      WHEN activity_raw >= 60 AND rising_raw < 20
       |        THEN 'Mature Field'
       |      WHEN activity_raw >= 50 AND future_raw >= 60
       |        THEN 'Active Innovation'
       |      ELSE 'Developing' END AS research_stage,
       |    list_slice(list_filter([
       |      CASE WHEN rising_score >= 70
       |        THEN 'Rapidly growing interest' END,
       |      CASE WHEN future_score >= 60
       |        THEN 'Many research gaps remain' END,
       |      CASE WHEN clinical_trials >= 20
       |        THEN clinical_trials || ' active clinical trials' END,
       |      CASE WHEN activity_score >= 70 AND rising_score < 30
       |        THEN 'Well-established field' END,
       |      CASE WHEN interest_score >= 70
       |        THEN 'High researcher attention' END
       |    ], x -> x IS NOT NULL), 1, 2) AS ins
       |  FROM sc)
       |SELECT keyword, current_papers, previous_papers, growth_rate,
       |  clinical_trials, future_mentions, rising_score,
       |  interest_score, activity_score, future_score, total_score,
       |  trend_label, research_stage,
       |  CASE WHEN len(ins) = 0 THEN 'Moderate research activity'
       |    ELSE array_to_string(ins, ' • ') END AS recommendation
       |FROM fin
       |ORDER BY total_score DESC, keyword
       |LIMIT 10""".stripMargin
  }

  /* ---------------- kw_yearly ---------------- */

  private val YearlyPanel = Seq(
    "risewave", "ebbwave", "batch", "slow query", "part key")
  private val Years = (2016 to 2023).map(_.toLong)

  private def kwYearly(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      (lit(2016) + pmod(col("doc_id"), lit(8))).cast("long").as("year"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(8)) >= 4, lit(" risewave"))
          .otherwise(lit(" ebbwave"))).as("t"))
    val hits = YearlyPanel.map { kw =>
      struct(lit(kw).as("keyword"), col("t").contains(kw).as("hit"))
    }
    val measured = docs
      .select(col("year"), explode(array(hits: _*)).as("h"))
      .where(col("h.hit"))
      .groupBy(col("h.keyword").as("keyword"), col("year"))
      .agg(count(lit(1)).as("cnt"))
    import s.implicits._
    val grid = YearlyPanel.toDF("keyword")
      .crossJoin(Years.toDF("year"))
    val dense = grid.join(measured, Seq("keyword", "year"), "left")
      .select(col("keyword"), col("year"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    TrendScore.yearlySummary(dense, "keyword", "year", "cnt")
      .orderBy(col("keyword"))
  }

  private val kwYearlySql = {
    val kws = YearlyPanel.map(k => s"('$k')").mkString(", ")
    s"""WITH td AS (
       |  SELECT (2016 + doc_id % 8)::BIGINT AS year,
       |    text || (CASE WHEN doc_id % 8 >= 4 THEN ' risewave'
       |      ELSE ' ebbwave' END) AS t
       |  FROM documents),
       |kw(keyword) AS (VALUES $kws),
       |measured AS (
       |  SELECT keyword, year, count(*)::BIGINT AS cnt
       |  FROM td, kw WHERE contains(t, keyword)
       |  GROUP BY 1, 2),
       |grid AS (
       |  SELECT keyword, year FROM kw,
       |    (SELECT unnest(generate_series(2016, 2023))::BIGINT
       |      AS year)),
       |dense AS (
       |  SELECT g.keyword, g.year, coalesce(m.cnt, 0)::BIGINT AS cnt
       |  FROM grid g LEFT JOIN measured m
       |    ON g.keyword = m.keyword AND g.year = m.year),
       |e AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY keyword ORDER BY year)
       |      AS idx,
       |    count(*) OVER (PARTITION BY keyword) AS ny,
       |    first_value(cnt) OVER (PARTITION BY keyword ORDER BY year
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |      AS first_cnt,
       |    last_value(cnt) OVER (PARTITION BY keyword ORDER BY year
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       |      AS last_cnt,
       |    row_number() OVER (PARTITION BY keyword
       |      ORDER BY cnt DESC, year) AS peak_rn
       |  FROM dense),
       |s AS (
       |  SELECT keyword,
       |    sum(cnt)::BIGINT AS total_count,
       |    max(ny) AS ny,
       |    avg(CASE WHEN idx <= ny / 2.0 THEN cnt END) AS fh,
       |    avg(CASE WHEN idx > ny / 2.0 THEN cnt END) AS sh,
       |    max(first_cnt) AS first_cnt,
       |    max(last_cnt) AS last_cnt,
       |    max(CASE WHEN peak_rn = 1 THEN year END)::BIGINT
       |      AS peak_year,
       |    max(CASE WHEN peak_rn = 1 THEN cnt END)::BIGINT
       |      AS peak_count
       |  FROM e GROUP BY keyword)
       |SELECT keyword, total_count,
       |  CASE WHEN ny < 2 THEN 'stable'
       |    WHEN sh > fh * 1.2 THEN 'rising'
       |    WHEN sh < fh * 0.8 THEN 'declining'
       |    ELSE 'stable' END AS trend_direction,
       |  CASE WHEN ny < 2 OR first_cnt = 0 THEN NULL
       |    ELSE round((last_cnt - first_cnt) / first_cnt * 100.0
       |      + 1e-9, 1) END AS growth_5yr,
       |  peak_year, peak_count
       |FROM s
       |ORDER BY keyword""".stripMargin
  }

  /* ---------------- emerging_topics ---------------- */

  /** Modifier panel for base 'batch'; 'brandterm' is a marker
    * appended only to doc_id%10=7 docs (all odd → current slice,
    * never the %5=0 two-years-ago slice), so the prev=0 ∧
    * current>10 new-topic branch fires.
    */
  private val EmergingModifiers = Seq(
    "slow query", "hash join", "merge sort", "window agg", "key value",
    "part key", "big table", "vector scan", "fast query", "dup",
    "brandterm")

  private def emergingTopics(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(10)) === 7, lit(" brandterm"))
          .otherwise(lit(""))).as("t"))
    val cur = pmod(col("doc_id"), lit(2)) === 1
    val prev = pmod(col("doc_id"), lit(5)) === 0
    val aggs = EmergingModifiers.zipWithIndex.flatMap { case (m, i) =>
      val hit = col("t").contains("batch") && col("t").contains(m)
      Seq(
        sum(when(hit && cur, 1L).otherwise(0L)).as(s"c_$i"),
        sum(when(hit && prev, 1L).otherwise(0L)).as(s"p_$i"))
    }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val rows = EmergingModifiers.zipWithIndex.map { case (m, i) =>
      struct(lit(s"batch $m").as("topic"), lit(m).as("modifier"),
        col(s"c_$i").as("current_year_count"),
        col(s"p_$i").as("two_years_ago_count"))
    }
    TrendScore.emergingTopics(
      one.select(explode(array(rows: _*)).as("r")).select(col("r.*")))
  }

  private val emergingTopicsSql = {
    val sums = EmergingModifiers.zipWithIndex.flatMap { case (m, i) =>
      val hit = s"contains(t, 'batch') AND contains(t, '$m')"
      Seq(
        s"sum(CASE WHEN $hit AND doc_id % 2 = 1 THEN 1 ELSE 0 END)" +
          s"::BIGINT AS c_$i",
        s"sum(CASE WHEN $hit AND doc_id % 5 = 0 THEN 1 ELSE 0 END)" +
          s"::BIGINT AS p_$i")
    }.mkString(",\n    ")
    val unions = EmergingModifiers.zipWithIndex.map { case (m, i) =>
      s"SELECT 'batch $m' AS topic, '$m' AS modifier, " +
        s"c_$i AS current_year_count, p_$i AS two_years_ago_count " +
        s"FROM g"
    }.mkString("\n  UNION ALL ")
    s"""WITH td AS (
       |  SELECT doc_id, text ||
       |    (CASE WHEN doc_id % 10 = 7 THEN ' brandterm' ELSE '' END)
       |    AS t
       |  FROM documents),
       |g AS (
       |  SELECT
       |    $sums
       |  FROM td),
       |m AS (
       |  $unions),
       |f AS (
       |  SELECT topic, modifier, current_year_count,
       |    two_years_ago_count,
       |    round(CASE WHEN two_years_ago_count > 0
       |      THEN (current_year_count - two_years_ago_count)
       |        / two_years_ago_count * 100.0
       |      ELSE (CASE WHEN current_year_count > 10 THEN 100.0
       |        ELSE 0.0 END) END + 1e-9, 1) AS growth_rate
       |  FROM m WHERE current_year_count >= 5)
       |SELECT * FROM f
       |ORDER BY growth_rate DESC, topic
       |LIMIT 10""".stripMargin
  }

  val defs: Seq[Qdef] = Seq(
    Qdef("hot_enhanced", hotEnhanced, Some(hotEnhancedSql)),
    Qdef("kw_yearly", kwYearly, Some(kwYearlySql)),
    Qdef("emerging_topics", emergingTopics, Some(emergingTopicsSql)))
}
