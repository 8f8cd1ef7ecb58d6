package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Events, Trends}

/** Event/sessionization/trend queries. Spark reads the ns-precision
  * `ts` as a LONG of nanos (see Tables.events); all time arithmetic is
  * integer seconds — `date_diff('second', epoch, ts)` on the DuckDB
  * side — so both engines agree exactly.
  */
object EventQueries {

  private val EpochSecs =
    "date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)"

  /* ---------------- ev_windowed_agg ---------------- */

  private def evWindowedAgg(s: SparkSession, d: String): DataFrame =
    Events.dailyAgg(Tables.events(s, d))
      .orderBy(col("day"), col("event_type"))

  private val evWindowedAggSql =
    """SELECT date_trunc('day', ts)::DATE AS day, event_type,
      |  count(*) AS cnt,
      |  round(sum(value), 2) AS sum_value,
      |  round(avg(value) + 0.000000001, 4) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /* ---------------- ev_sessionize ---------------- */

  private def evSessionize(s: SparkSession, d: String): DataFrame =
    Events.sessionize(Tables.events(s, d), gapSecs = 1800)
      .orderBy(col("user_id"), col("session_idx"))

  private val evSessionizeSql =
    s"""WITH e AS (SELECT event_id, user_id, value, $EpochSecs AS s FROM events),
       |f AS (SELECT event_id, user_id, value, s,
       |    CASE WHEN lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) IS NULL
       |           OR s - lag(s) OVER (PARTITION BY user_id ORDER BY s, event_id) > 1800
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM e),
       |g AS (SELECT user_id, value, s,
       |    (sum(new_session) OVER (PARTITION BY user_id ORDER BY s, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_idx
       |  FROM f)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |  round(sum(value), 2) AS sum_value,
       |  (max(s) - min(s)) AS duration_secs
       |FROM g GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /* ---------------- ev_user_topk ---------------- */

  private def evUserTopK(s: SparkSession, d: String): DataFrame =
    Events.topUsers(Tables.events(s, d), "purchase", 20)
      .select(col("user_id"), col("n_events"), col("sum_value"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("rank"))

  private val evUserTopKSql =
    """WITH s AS (SELECT user_id, count(*) AS n_events,
      |    round(sum(value), 2) AS sum_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |r AS (SELECT user_id, n_events, sum_value,
      |    row_number() OVER (ORDER BY sum_value DESC, user_id)::BIGINT AS rank
      |  FROM s)
      |SELECT user_id, n_events, sum_value, rank FROM r
      |WHERE rank <= 20 ORDER BY rank""".stripMargin

  /* ---------------- ev_props_agg ---------------- */

  private val PropsBucket = 25L

  /** Typed JSON property rollup (see Events.propsAgg): extract k from
    * the schemaless props payload, aggregate per (event_type,
    * k div 25 bucket).
    */
  private def evPropsAgg(s: SparkSession, d: String): DataFrame =
    Events.propsAgg(Tables.events(s, d), PropsBucket)

  // the json_valid + json_type gate mirrors Spark's strict typed
  // from_json: malformed JSON, missing key, float k and quoted "12"
  // all -> NULL (a bare CAST would ERROR on malformed props and
  // round '12.5' to 13); TRY_CAST, not CAST, because json_type
  // 'UBIGINT' admits values in (2^63, 2^64) that overflow BIGINT —
  // Spark's from_json(k BIGINT) nulls those, and CAST would abort
  // the whole oracle instead; NULLS LAST pins the k_bucket null
  // ordering both engines' defaults disagree on
  private val evPropsAggSql =
    s"""WITH e AS (SELECT event_type,
       |    CASE WHEN json_valid(props)
       |        AND json_type(json_extract(props, '$$.k'))
       |          IN ('BIGINT', 'UBIGINT')
       |      THEN TRY_CAST(json_extract_string(props, '$$.k') AS BIGINT)
       |      END AS k
       |  FROM events)
       |SELECT event_type, k // $PropsBucket AS k_bucket,
       |  count(*)::BIGINT AS n_events, sum(k)::BIGINT AS sum_k,
       |  round(avg(k) + 0.000000001, 4) AS avg_k,
       |  min(k) AS min_k, max(k) AS max_k
       |FROM e GROUP BY 1, 2
       |ORDER BY event_type, k_bucket NULLS LAST""".stripMargin

  /* ---------------- ev_funnel ---------------- */

  private val FunnelStages = Seq("view", "click", "purchase")

  private def evFunnel(s: SparkSession, d: String): DataFrame =
    Events.funnel(Tables.events(s, d), FunnelStages)
      .orderBy(col("stage_idx"))

  private val evFunnelSql = {
    val stageCtes = FunnelStages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s0 AS (SELECT user_id, min(s) AS entry_s FROM e
           |  WHERE event_type = '$st' GROUP BY user_id)""".stripMargin
      else
        s"""s$i AS (SELECT e.user_id, min(e.s) AS entry_s FROM e
           |  JOIN s${i - 1} ON e.user_id = s${i - 1}.user_id
           |    AND e.s > s${i - 1}.entry_s
           |  WHERE e.event_type = '$st' GROUP BY e.user_id)""".stripMargin
    }.mkString(",\n")
    val unions = FunnelStages.zipWithIndex.map { case (st, i) =>
      s"SELECT ${i}::BIGINT AS stage_idx, '$st' AS stage, count(*)::BIGINT AS users FROM s$i"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (SELECT user_id, event_type, $EpochSecs AS s FROM events),
       |$stageCtes,
       |c AS (
       |  $unions)
       |SELECT stage_idx, stage, users,
       |  round(users::DOUBLE /
       |        nullif(lag(users) OVER (ORDER BY stage_idx), 0), 6)
       |    AS conv_from_prev
       |FROM c ORDER BY stage_idx""".stripMargin
  }

  /* ---------------- ev_asof_view ---------------- */

  /** Purchases enriched with the most recent prior view per user —
    * oracle uses DuckDB's native ASOF JOIN; the Spark side is the
    * union+window form (see Events.asofJoin).
    */
  private def evAsofView(s: SparkSession, d: String): DataFrame =
    Events.asofJoin(Tables.events(s, d), "view", "purchase")
      .select(col("event_id"), col("user_id"),
        col("right_s").as("purchase_s"), col("left_s").as("view_s"),
        col("lag_secs"))
      .orderBy(col("event_id"))

  private val evAsofViewSql =
    s"""WITH e AS (SELECT event_id, user_id, event_type, $EpochSecs AS s
       |  FROM events),
       |v AS (SELECT user_id, s FROM e WHERE event_type = 'view'),
       |p AS (SELECT event_id, user_id, s FROM e WHERE event_type = 'purchase')
       |SELECT p.event_id, p.user_id, p.s AS purchase_s, v.s AS view_s,
       |  (p.s - v.s)::BIGINT AS lag_secs
       |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.s >= v.s
       |ORDER BY p.event_id""".stripMargin

  /* ---------------- ev_range_clicks ---------------- */

  /** Clicks in the hour before each purchase (event-time range join
    * via a RANGE window frame — identical formulation both engines).
    */
  private def evRangeClicks(s: SparkSession, d: String): DataFrame =
    Events.rangeCount(Tables.events(s, d), "click", "purchase", 3600L)
      .orderBy(col("event_id"))

  private val evRangeClicksSql =
    s"""WITH e AS (SELECT event_id, user_id, event_type, $EpochSecs AS s
       |  FROM events WHERE event_type IN ('click', 'purchase'))
       |SELECT event_id, user_id, s,
       |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
       |    PARTITION BY user_id ORDER BY s
       |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)::BIGINT AS n_in_range
       |FROM e QUALIFY event_type = 'purchase'
       |ORDER BY event_id""".stripMargin

  /* ---------------- ev_anomaly ---------------- */

  private val AnomalyZ = 2.0

  private def evAnomaly(s: SparkSession, d: String): DataFrame =
    Events.anomalies(Tables.events(s, d), AnomalyZ)
      .orderBy(col("day"), col("event_type"))

  private val evAnomalySql =
    s"""WITH daily AS (SELECT date_trunc('day', ts)::DATE AS day,
       |    event_type, count(*)::BIGINT AS cnt
       |  FROM events GROUP BY 1, 2),
       |z AS (SELECT day, event_type, cnt,
       |    round((cnt - avg(cnt) OVER (PARTITION BY event_type))
       |      / nullif(stddev_samp(cnt) OVER (PARTITION BY event_type), 0.0)
       |      + 0.000000001, 6) AS z_score
       |  FROM daily)
       |SELECT day, event_type, cnt, z_score,
       |  coalesce(abs(z_score) >= $AnomalyZ, false) AS is_anomaly
       |FROM z ORDER BY day, event_type""".stripMargin

  /* ---------------- ev_retention ---------------- */

  private val RetentionPeriodSecs = 86400L // daily cohorts
  private val RetentionMaxOffset = 14

  private def evRetention(s: SparkSession, d: String): DataFrame =
    Events.retention(Tables.events(s, d), RetentionPeriodSecs,
      RetentionMaxOffset)
      .orderBy(col("cohort_period"), col("period_offset"))

  private val evRetentionSql =
    s"""WITH uw AS (SELECT DISTINCT user_id,
       |    (($EpochSecs) // $RetentionPeriodSecs)::BIGINT AS period
       |  FROM events),
       |c AS (SELECT user_id, period,
       |    min(period) OVER (PARTITION BY user_id) AS cohort_period
       |  FROM uw),
       |a AS (SELECT cohort_period,
       |    (period - cohort_period)::BIGINT AS period_offset,
       |    count(*)::BIGINT AS n_users
       |  FROM c WHERE period - cohort_period <= $RetentionMaxOffset
       |  GROUP BY cohort_period, period - cohort_period)
       |SELECT cohort_period, period_offset, n_users,
       |  round(n_users::DOUBLE / first_value(n_users) OVER (
       |    PARTITION BY cohort_period ORDER BY period_offset)
       |    + 0.000000001, 6) AS retained_frac
       |FROM a ORDER BY cohort_period, period_offset""".stripMargin

  /* ---------------- trend_daily ---------------- */

  private def trendDaily(s: SparkSession, d: String): DataFrame =
    Trends.dailyWithMovingAvg(Events.dailyAgg(Tables.events(s, d)))
      .orderBy(col("day"), col("event_type"))

  private val trendDailySql =
    """WITH dd AS (SELECT date_trunc('day', ts)::DATE AS day, event_type,
      |    count(*) AS cnt,
      |    round(sum(value), 2) AS sum_value,
      |    round(avg(value) + 0.000000001, 4) AS avg_value
      |  FROM events GROUP BY 1, 2)
      |SELECT day, event_type, cnt, sum_value, avg_value,
      |  round(avg(cnt) OVER (PARTITION BY event_type ORDER BY day
      |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) + 0.000000001, 4) AS ma7
      |FROM dd ORDER BY day, event_type""".stripMargin

  /* ---------------- trend_growth ---------------- */

  private def trendGrowth(s: SparkSession, d: String): DataFrame =
    Trends.growth(Tables.events(s, d))
      .select(col("event_type"), col("early_cnt"), col("late_cnt"),
        col("growth_ratio"), col("trend"))
      .orderBy(col("event_type"))

  private val trendGrowthSql =
    s"""WITH e AS (SELECT event_type, $EpochSecs AS s FROM events),
       |b AS (SELECT min(s) AS min_s, max(s) AS max_s FROM e),
       |h AS (SELECT event_type,
       |    CASE WHEN s > (min_s + max_s) // 2 THEN 'late' ELSE 'early' END AS half
       |  FROM e CROSS JOIN b),
       |g AS (SELECT event_type,
       |    sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END)::BIGINT AS early_cnt,
       |    sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END)::BIGINT AS late_cnt
       |  FROM h GROUP BY event_type)
       |SELECT event_type, early_cnt, late_cnt,
       |  round(late_cnt::DOUBLE / greatest(early_cnt::DOUBLE, 1.0), 6) AS growth_ratio,
       |  CASE WHEN round(late_cnt::DOUBLE / greatest(early_cnt::DOUBLE, 1.0), 6) > 1.1
       |         THEN 'rising'
       |       WHEN round(late_cnt::DOUBLE / greatest(early_cnt::DOUBLE, 1.0), 6) < 0.9
       |         THEN 'declining'
       |       ELSE 'stable' END AS trend
       |FROM g ORDER BY event_type""".stripMargin

  /* ---------------- ev_value_pctl ---------------- */

  private def evValuePctl(s: SparkSession, d: String): DataFrame =
    Events.valuePercentiles(Tables.events(s, d), "event_type", "value")
      .orderBy(col("event_type"))

  private val evValuePctlSql =
    """SELECT event_type, count(*)::BIGINT AS n_events,
      |  round(avg(value) + 0.000000001, 6) AS mean_value,
      |  round(quantile_cont(value, 0.5) + 0.000000001, 6) AS p50,
      |  round(quantile_cont(value, 0.9) + 0.000000001, 6) AS p90,
      |  round(quantile_cont(value, 0.99) + 0.000000001, 6) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /* ---------------- ev_transitions ---------------- */

  private def evTransitions(s: SparkSession, d: String): DataFrame =
    Events.transitionMatrix(Tables.events(s, d))
      .orderBy(col("prev_type"), col("next_type"))

  private val evTransitionsSql =
    s"""WITH e AS (SELECT user_id, event_type, event_id,
       |    $EpochSecs AS s FROM events),
       |p AS (SELECT event_type AS next_type,
       |    lag(event_type) OVER (PARTITION BY user_id
       |      ORDER BY s, event_id) AS prev_type
       |  FROM e),
       |m AS (SELECT prev_type, next_type, count(*)::BIGINT AS n_trans
       |  FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT prev_type, sum(n_trans)::BIGINT AS tot
       |  FROM m GROUP BY 1)
       |SELECT m.prev_type, m.next_type, n_trans,
       |  round(n_trans::DOUBLE / tot + 0.000000001, 6) AS prob
       |FROM m JOIN t ON m.prev_type = t.prev_type
       |ORDER BY m.prev_type, m.next_type""".stripMargin

  /* ---------------- ev_dau ---------------- */

  private def evDau(s: SparkSession, d: String): DataFrame =
    Events.dailyActiveUsers(Tables.events(s, d))
      .orderBy(col("day"))

  private val evDauSql =
    """SELECT date_trunc('day', ts)::DATE AS day,
      |  count(*)::BIGINT AS n_events,
      |  count(DISTINCT user_id)::BIGINT AS dau,
      |  round(count(*)::DOUBLE / count(DISTINCT user_id)
      |    + 0.000000001, 4) AS events_per_user
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("ev_dau", evDau, Some(evDauSql)),
    Qdef("ev_value_pctl", evValuePctl, Some(evValuePctlSql)),
    Qdef("ev_windowed_agg", evWindowedAgg, Some(evWindowedAggSql)),
    Qdef("ev_sessionize", evSessionize, Some(evSessionizeSql)),
    Qdef("ev_transitions", evTransitions, Some(evTransitionsSql)),
    Qdef("ev_user_topk", evUserTopK, Some(evUserTopKSql)),
    Qdef("ev_props_agg", evPropsAgg, Some(evPropsAggSql)),
    Qdef("ev_funnel", evFunnel, Some(evFunnelSql)),
    Qdef("ev_asof_view", evAsofView, Some(evAsofViewSql)),
    Qdef("ev_range_clicks", evRangeClicks, Some(evRangeClicksSql)),
    Qdef("ev_retention", evRetention, Some(evRetentionSql)),
    Qdef("ev_anomaly", evAnomaly, Some(evAnomalySql)),
    Qdef("trend_daily", trendDaily, Some(trendDailySql)),
    Qdef("trend_growth", trendGrowth, Some(trendGrowthSql)))
}
