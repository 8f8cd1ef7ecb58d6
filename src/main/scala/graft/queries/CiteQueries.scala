package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Chunker, Citations, Recommender}

/** Citation analytics bound to the synthetic corpus (reference:
  * backend/app/api/routes/citations.py). The Semantic Scholar
  * attributes are synthesized deterministically from doc_id (year
  * 2005-2024, citation counts 0-8483, influential share by residue
  * class, 1-5 fields, alternating open access) so every ladder rung
  * and reason fires at sf0.01; the citing graph for trends is the
  * fixed map j → (j·31) mod 500.
  */
object CiteQueries {

  private val CurrentYear = 2025

  private def citedDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      (lit(2005) + pmod(col("doc_id"), lit(20))).cast("long").as("year"),
      pmod(col("doc_id") * 17, lit(12000)).cast("long")
        .as("citation_count"),
      (pmod(col("doc_id") * 17, lit(12000)) /
        (lit(2) + pmod(col("doc_id"), lit(5)))).cast("long")
        .as("influential"),
      (lit(1) + pmod(col("doc_id"), lit(5))).cast("long").as("n_fields"),
      (pmod(col("doc_id"), lit(2)) === 0).as("open_access"))

  private val citedSqlCte =
    """c AS (
      |  SELECT doc_id, (2005 + doc_id % 20)::BIGINT AS year,
      |    ((doc_id * 17) % 12000)::BIGINT AS citation_count,
      |    (((doc_id * 17) % 12000) // (2 + doc_id % 5))::BIGINT
      |      AS influential,
      |    (1 + doc_id % 5)::BIGINT AS n_fields,
      |    doc_id % 2 = 0 AS open_access
      |  FROM documents)""".stripMargin

  /* ---------------- cite_landmark ---------------- */

  private def citeLandmark(s: SparkSession, d: String): DataFrame = {
    val c = citedDocs(s, d)
    c.select(col("doc_id"), col("year"), col("citation_count"),
        Citations.landmarkScore(col("year"), col("citation_count"),
          col("influential"), col("n_fields"), CurrentYear)
          .as("landmark_score"),
        Citations.landmarkReasons(col("year"), col("citation_count"),
          col("influential"), col("n_fields"), col("open_access"),
          CurrentYear).as("reasons"))
      .orderBy(col("landmark_score").desc, col("doc_id"))
  }

  private val citeLandmarkSql =
    s"""WITH $citedSqlCte,
       |s AS (
       |  SELECT *, greatest(1, $CurrentYear - year) AS age,
       |    citation_count / greatest(1, $CurrentYear - year) AS cpy
       |  FROM c),
       |r AS (
       |  SELECT *, list_slice(list_filter([
       |      CASE WHEN citation_count >= 10000
       |             THEN 'exceptional_citations'
       |           WHEN citation_count >= 1000 THEN 'highly_cited' END,
       |      CASE WHEN cpy >= 200 THEN 'high_velocity' END,
       |      CASE WHEN influential >= 100
       |             THEN 'influential_citations' END,
       |      CASE WHEN n_fields >= 3 THEN 'cross_disciplinary' END,
       |      CASE WHEN age >= 10 AND citation_count >= 1000
       |             THEN 'foundational' END,
       |      CASE WHEN open_access THEN 'open_access' END
       |    ], x -> x IS NOT NULL), 1, 4) AS kept
       |  FROM s)
       |SELECT doc_id, year, citation_count,
       |  round(least(100.0,
       |      (CASE WHEN cpy >= 500 THEN 100.0 WHEN cpy >= 200 THEN 80.0
       |        WHEN cpy >= 100 THEN 60.0 WHEN cpy >= 50 THEN 40.0
       |        ELSE least(40.0, cpy * 0.8) END)
       |    + influential / greatest(1, citation_count) * 20.0
       |    + least(10.0, n_fields * 2.0)
       |    + (CASE WHEN age >= 10 AND citation_count >= 1000 THEN 10.0
       |        WHEN age >= 5 AND citation_count >= 500 THEN 5.0
       |        ELSE 0.0 END)) + 1e-9, 1) AS landmark_score,
       |  CASE WHEN len(kept) = 0 THEN 'significant_contribution'
       |    ELSE array_to_string(kept, ';') END AS reasons
       |FROM r
       |ORDER BY landmark_score DESC, doc_id""".stripMargin

  /* ---------------- cite_trends ---------------- */

  private def citeTrends(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.documents(s, d).select(
        pmod(col("doc_id") * 31, lit(500)).cast("long").as("target"),
        (lit(2005) + pmod(col("doc_id"), lit(20))).cast("long")
          .as("cyear"),
        col("doc_id"))
      .where(col("target") =!= col("doc_id"))
      .drop("doc_id")
    Citations.yearlyTrends(edges, "target", "cyear")
      .orderBy(col("target"))
  }

  private val citeTrendsSql =
    """WITH e AS (
      |  SELECT ((doc_id * 31) % 500)::BIGINT AS target,
      |    (2005 + doc_id % 20)::BIGINT AS cyear
      |  FROM documents
      |  WHERE (doc_id * 31) % 500 <> doc_id),
      |y AS (
      |  SELECT target, cyear, count(*)::BIGINT AS c
      |  FROM e GROUP BY 1, 2),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY target
      |    ORDER BY c DESC, cyear) AS rn FROM y)
      |SELECT target, sum(c)::BIGINT AS total_sampled,
      |  max(CASE WHEN rn = 1 THEN cyear END)::BIGINT AS peak_year,
      |  max(CASE WHEN rn = 1 THEN c END)::BIGINT AS peak_count,
      |  count(*)::BIGINT AS n_years
      |FROM r GROUP BY target
      |ORDER BY target""".stripMargin

  /* ---------------- cite_related ---------------- */

  /** Related papers around center 42 (citations.py:644): the citing
    * map uses mod 100 (5 citers at sf0.01) so the ranking has
    * substance; the reference side is the center's single outgoing
    * edge.
    */
  private def citeRelated(s: SparkSession, d: String): DataFrame = {
    val e = Tables.documents(s, d).select(col("doc_id"),
      pmod(col("doc_id") * 31, lit(100)).cast("long").as("target"),
      pmod(col("doc_id") * 17, lit(12000)).cast("long").as("cites"))
    val citers = e
      .where(col("target") === 42 && col("doc_id") =!= 42)
      .select(col("doc_id").as("paper_id"),
        lit("cites_this").as("relation"), col("cites").as("relevance"))
    val refs = e
      .where(col("doc_id") === 42 && col("target") =!= 42)
      .select(col("target").as("paper_id"),
        lit("cited_by_this").as("relation"),
        pmod(col("target") * 17, lit(12000)).cast("long")
          .as("relevance"))
    Citations.relatedPapers(citers.unionAll(refs), centerId = 42)
  }

  private val citeRelatedSql =
    """WITH e AS (
      |  SELECT doc_id, ((doc_id * 31) % 100)::BIGINT AS target,
      |    ((doc_id * 17) % 12000)::BIGINT AS cites
      |  FROM documents),
      |citers AS (
      |  SELECT doc_id AS paper_id, 'cites_this' AS relation,
      |    cites AS relevance
      |  FROM e WHERE target = 42 AND doc_id <> 42),
      |refs AS (
      |  SELECT target AS paper_id, 'cited_by_this' AS relation,
      |    ((target * 17) % 12000)::BIGINT AS relevance
      |  FROM e WHERE doc_id = 42 AND target <> 42),
      |u AS (
      |  SELECT * FROM citers UNION ALL SELECT * FROM refs),
      |d AS (
      |  SELECT *, row_number() OVER (PARTITION BY paper_id
      |    ORDER BY relevance DESC, relation) AS rn FROM u),
      |f AS (SELECT paper_id, relation, relevance FROM d WHERE rn = 1),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY relevance DESC,
      |    paper_id)::BIGINT AS rnk FROM f)
      |SELECT paper_id, relation, relevance, rnk
      |FROM r WHERE rnk <= 10
      |ORDER BY rnk""".stripMargin

  /* ---------------- paper_rank ---------------- */

  /** Unique-paper quality ranking (paper_citation_ranker.py:102
    * get_unique_papers + :184): chunk counts come from the real
    * fixed chunker (size 10 / overlap 5 — small on purpose, so the
    * >20 / >50 / >100 chunk-richness branches all fire on the
    * 48-553-char test docs); year/citations/fulltext synthesized
    * from doc_id (doc_id%19=0 -> unknown year, exercising the
    * neutral-15 branch; citations 0..1499 covering every ladder
    * rung; every third paper abstract-only).
    */
  private def paperRank(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val chunkCounts = Chunker
      .fixedChunks(docs, "doc_id", "text", chunkSize = 10, overlap = 5)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("chunk_count"))
    val meta = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(19)) === 0, lit(0L))
        .otherwise(lit(2005) + pmod(col("doc_id"), lit(20)))
        .cast("long").as("year"),
      pmod(col("doc_id") * 37, lit(1500)).cast("long")
        .as("citation_count"),
      (pmod(col("doc_id"), lit(3)) =!= 0).as("has_fulltext"))
    Citations.paperQualityRank(
      meta.join(chunkCounts, "doc_id"), CurrentYear, topN = 1000)
  }

  private val paperRankSql =
    s"""WITH ${SqlSnippets.chunkCtes(10, 5)},
       |u AS (
       |  SELECT doc_id, count(*)::BIGINT AS chunk_count
       |  FROM ch GROUP BY doc_id),
       |m AS (
       |  SELECT d.doc_id,
       |    (CASE WHEN d.doc_id % 19 = 0 THEN 0
       |          ELSE 2005 + d.doc_id % 20 END)::BIGINT AS year,
       |    ((d.doc_id * 37) % 1500)::BIGINT AS citation_count,
       |    d.doc_id % 3 <> 0 AS has_fulltext,
       |    u.chunk_count
       |  FROM documents d JOIN u USING (doc_id)),
       |sc AS (
       |  SELECT *,
       |    CASE WHEN citation_count <= 0 THEN 0.0
       |         WHEN citation_count < 10 THEN citation_count * 2.0
       |         WHEN citation_count < 100
       |           THEN 20.0 + (citation_count - 10) * 0.11
       |         WHEN citation_count < 1000
       |           THEN 30.0 + (citation_count - 100) * 0.011
       |         ELSE 40.0 END AS cs,
       |    CASE WHEN year = 0 THEN 15.0 ELSE
       |      CASE WHEN $CurrentYear - year <= 1 THEN 30.0
       |           WHEN $CurrentYear - year <= 2 THEN 27.0
       |           WHEN $CurrentYear - year <= 3 THEN 24.0
       |           WHEN $CurrentYear - year <= 5 THEN 20.0
       |           WHEN $CurrentYear - year <= 10 THEN 15.0
       |           ELSE greatest(5.0,
       |             15.0 - ($CurrentYear - year - 10)) END END AS rs,
       |    CASE WHEN NOT has_fulltext THEN 10.0 ELSE
       |      20.0 + CASE WHEN chunk_count > 100 THEN 10.0
       |                  WHEN chunk_count > 50 THEN 7.0
       |                  WHEN chunk_count > 20 THEN 5.0
       |                  ELSE 3.0 END END AS ns
       |  FROM m)
       |SELECT doc_id, year, citation_count, has_fulltext, chunk_count,
       |  round(cs + 1e-9, 1) AS citation_score,
       |  round(rs + 1e-9, 1) AS recency_score,
       |  round(ns + 1e-9, 1) AS content_score,
       |  round(cs + rs + ns + 1e-9, 1) AS quality_score
       |FROM sc
       |ORDER BY quality_score DESC, doc_id
       |LIMIT 1000""".stripMargin

  /* ---------------- reco_enhanced ---------------- */

  /** Citation-aware enhanced recommendation end to end
    * (paper_recommender.py:778 recommend_papers_enhanced): velocity
    * from citations/age, the 0-40/0-30/0-30 quality ladders, the
    * classic/breakthrough precedence classification, per-type gates
    * at the general_oncology baselines (classic 50, velocity 15),
    * the estimated-quality fallback for papers without citation
    * data, then the gate-or->=60 filter and the 50:50 balanced pick
    * with best-available fill. Candidates are a bounded window
    * (doc_id < 39 — the reference pools ~max_papers x 6 search
    * hits; sized so the breakthrough bucket is UNDERFULL at sf0.01
    * and the best-available fill path reaches the checked output);
    * attributes are synthesized from doc_id with a split citation
    * range (every third paper on the 0-399 scale, others 0-39) so
    * classics, breakthroughs, gate failures, estimated keeps AND
    * drops, and an estimated fill survivor all fire at sf0.01.
    */
  private def recoEnhanced(s: SparkSession, d: String): DataFrame = {
    val cand = Tables.documents(s, d).where(col("doc_id") < 39).select(
      col("doc_id"),
      (lit(2005) + pmod(col("doc_id"), lit(21))).cast("long").as("year"),
      (pmod(col("doc_id"), lit(11)) === 0).as("estimated"),
      when(pmod(col("doc_id"), lit(11)) === 0, lit(0L))
        .otherwise(when(pmod(col("doc_id"), lit(3)) === 0,
          pmod(col("doc_id") * 23, lit(400)))
          .otherwise(pmod(col("doc_id") * 23, lit(40))))
        .cast("long").as("citation_count"),
      when(pmod(col("doc_id"), lit(9)) === 0, lit(5L))
        .otherwise(pmod(col("doc_id"), lit(3))).cast("long")
        .as("influential"),
      (pmod(col("doc_id"), lit(4)) === 0).as("high_impact"))
    val typed = cand
      .withColumn("vel", Recommender.citationVelocity(
        col("citation_count"), col("year"), CurrentYear))
      .withColumn("paper_type", Recommender.classifyPaperType(
        col("citation_count"), col("vel"), col("influential"),
        col("year"), CurrentYear))
      .withColumn("quality_score",
        when(col("estimated"), Recommender.estimatedQuality(
          col("high_impact"), col("year"), CurrentYear))
          .otherwise(round(
            Recommender.citationScore(col("citation_count")) +
              Recommender.velocityScore(col("vel")) +
              Recommender.recencyScore(col("year"), CurrentYear) +
              lit(1e-9), 1)))
      .withColumn("passes_gate", Recommender.passesQualityGate(
        col("paper_type"), col("citation_count"), col("vel"),
        classicThreshold = 50, breakthroughVelocity = 15))
    Recommender.balancedSelect(typed, "doc_id", maxPapers = 6)
      .select(col("doc_id"), col("year"), col("citation_count"),
        col("influential"), col("paper_type"),
        round(col("vel") + lit(1e-9), 6).as("velocity"),
        col("quality_score"), col("passes_gate"),
        col("bucket").cast("long").as("bucket"),
        col("brn").cast("long").as("brn"))
      .orderBy(col("bucket"), col("brn"))
  }

  private val recoEnhancedSql =
    s"""WITH cand AS (
       |  SELECT doc_id,
       |    (2005 + doc_id % 21)::BIGINT AS year,
       |    doc_id % 11 = 0 AS estimated,
       |    (CASE WHEN doc_id % 11 = 0 THEN 0
       |          WHEN doc_id % 3 = 0 THEN (doc_id * 23) % 400
       |          ELSE (doc_id * 23) % 40 END)::BIGINT
       |      AS citation_count,
       |    (CASE WHEN doc_id % 9 = 0 THEN 5
       |          ELSE doc_id % 3 END)::BIGINT AS influential,
       |    doc_id % 4 = 0 AS high_impact
       |  FROM documents WHERE doc_id < 39),
       |v AS (
       |  SELECT *, CASE WHEN citation_count > 0
       |      THEN citation_count / greatest(1, $CurrentYear - year)
       |      ELSE 0.0 END AS vel
       |  FROM cand),
       |t AS (
       |  SELECT *,
       |    CASE WHEN citation_count <= 0 THEN 'unknown'
       |         WHEN $CurrentYear - year >= 3 AND citation_count >= 50
       |           THEN 'classic'
       |         WHEN $CurrentYear - year >= 3 AND citation_count >= 30
       |           THEN 'likely_classic'
       |         WHEN $CurrentYear - year <= 2 AND
       |              ((citation_count >= 10 AND vel >= 5)
       |               OR influential >= 3) THEN 'breakthrough'
       |         WHEN $CurrentYear - year BETWEEN 1 AND 3
       |              AND citation_count >= 5 AND vel >= 3
       |           THEN 'likely_breakthrough'
       |         ELSE 'unknown' END AS paper_type,
       |    CASE WHEN estimated THEN least(100.0,
       |        50.0 + (CASE WHEN high_impact THEN 30.0 ELSE 0.0 END)
       |        + (CASE WHEN $CurrentYear - year <= 2 THEN 5.0
       |             WHEN $CurrentYear - year >= 5 AND
       |               50.0 + (CASE WHEN high_impact THEN 30.0
       |                 ELSE 0.0 END) >= 70 THEN 10.0
       |             ELSE 0.0 END))
       |      ELSE round(
       |        (CASE WHEN citation_count <= 0 THEN 0.0
       |          WHEN citation_count < 10 THEN citation_count * 2.0
       |          WHEN citation_count < 100
       |            THEN 20.0 + (citation_count - 10) * 0.11
       |          WHEN citation_count < 1000
       |            THEN 30.0 + (citation_count - 100) * 0.011
       |          ELSE 40.0 END) +
       |        (CASE WHEN vel <= 0 THEN 0.0
       |          WHEN vel < 5 THEN vel * 2
       |          WHEN vel < 20 THEN 10.0 + (vel - 5) * 0.67
       |          WHEN vel < 50 THEN 20.0 + (vel - 20) * 0.33
       |          ELSE 30.0 END) +
       |        (CASE WHEN $CurrentYear - year <= 1 THEN 30.0
       |          WHEN $CurrentYear - year <= 2 THEN 27.0
       |          WHEN $CurrentYear - year <= 3 THEN 24.0
       |          WHEN $CurrentYear - year <= 5 THEN 20.0
       |          WHEN $CurrentYear - year <= 10 THEN 15.0
       |          ELSE greatest(5.0,
       |            15.0 - ($CurrentYear - year - 10)) END)
       |        + 1e-9, 1) END AS quality_score
       |  FROM v),
       |g AS (
       |  SELECT *,
       |    CASE WHEN paper_type = 'classic' THEN citation_count >= 50
       |         WHEN paper_type = 'likely_classic'
       |           THEN citation_count >= 25.0
       |         WHEN paper_type = 'breakthrough' THEN vel >= 15
       |         WHEN paper_type = 'likely_breakthrough' THEN vel >= 7.5
       |         ELSE citation_count >= 20 OR vel >= 10 END
       |      AS passes_gate
       |  FROM t),
       |k AS (SELECT * FROM g WHERE passes_gate OR quality_score >= 60),
       |b AS (
       |  SELECT *, CASE
       |      WHEN paper_type IN ('classic', 'likely_classic') THEN 0
       |      WHEN paper_type IN ('breakthrough', 'likely_breakthrough')
       |        THEN 1
       |      ELSE 2 END AS bucket
       |  FROM k),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY bucket
       |    ORDER BY quality_score DESC, doc_id) AS brn
       |  FROM b),
       |sel AS (SELECT * FROM r WHERE bucket <> 2 AND brn <= 3),
       |lo AS (
       |  SELECT *, row_number() OVER (ORDER BY quality_score DESC,
       |    doc_id) AS frn
       |  FROM r WHERE bucket = 2 OR brn > 3),
       |fill AS (
       |  SELECT * EXCLUDE (bucket, brn, frn), 2 AS bucket,
       |    frn AS brn
       |  FROM lo WHERE frn <= 6 - (SELECT count(*) FROM sel)),
       |res AS (
       |  SELECT * EXCLUDE (estimated, high_impact) FROM sel
       |  UNION ALL
       |  SELECT * EXCLUDE (estimated, high_impact) FROM fill)
       |SELECT doc_id, year, citation_count, influential, paper_type,
       |  round(vel + 1e-9, 6) AS velocity, quality_score, passes_gate,
       |  bucket::BIGINT AS bucket, brn::BIGINT AS brn
       |FROM res
       |ORDER BY bucket, brn""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("cite_landmark", citeLandmark, Some(citeLandmarkSql)),
    Qdef("cite_trends", citeTrends, Some(citeTrendsSql)),
    Qdef("cite_related", citeRelated, Some(citeRelatedSql)),
    Qdef("paper_rank", paperRank, Some(paperRankSql)),
    Qdef("reco_enhanced", recoEnhanced, Some(recoEnhancedSql)))
}
