package graft

import graft.operators.Trends

class KeywordTrendsSpec extends SparkSpec {
  import spark.implicits._

  private def rep(w: String, n: Int): String = Seq.fill(n)(w).mkString(" ")

  // 4 years; mid = 2 → older {2020, 2021}, recent {2022, 2023}
  private val docs = Seq(
    // 'nanopore': absent older, 12 recent → emerging (older=0 rule)
    // 'organoid': 4 older vs 10 recent → emerging (>2× rule)
    // 'microarray': 12 older vs 3 recent → declining
    // 'genome': 8 older vs 9 recent → stable
    // 'rare': 2 older vs 3 recent → below minCount, no class
    // 'data' is a stopword; 'dna' (3 chars) fails the >3 filter
    (2020L, rep("microarray", 6) + " " + rep("genome", 4) + " " +
      rep("organoid", 2) + " rare data dna"),
    (2021L, rep("microarray", 6) + " " + rep("genome", 4) + " " +
      rep("organoid", 2) + " rare data dna"),
    (2022L, rep("nanopore", 6) + " " + rep("genome", 5) + " " +
      rep("organoid", 5) + " " + rep("rare", 2) + " microarray"),
    (2023L, rep("nanopore", 6) + " " + rep("genome", 4) + " " +
      rep("organoid", 5) + " rare " + rep("microarray", 2))
  ).toDF("year", "text")

  test("classification ladder matches the reference's rules") {
    val out = Trends.keywordTrends(docs, "year", "text")
      .collect().map(r => r.getString(1) -> r).toMap
    assert(out("nanopore").getString(0) == "emerging")
    assert(out("nanopore").getLong(2) == 0L &&
      out("nanopore").getLong(3) == 12L)
    assert(out("organoid").getString(0) == "emerging")
    assert(out("microarray").getString(0) == "declining")
    assert(out("genome").getString(0) == "stable")
    assert(!out.contains("rare"))  // both halves ≤ 5
    assert(!out.contains("data")) // stopword
    assert(!out.contains("dna"))  // length ≤ 3
  }

  test("per-year top-k cut happens BEFORE half-summing") {
    // perYearTop=1 keeps only each year's single top keyword:
    // microarray (2020, 2021) and nanopore (2022, 2023) — genome's
    // counts never enter the half sums
    val out = Trends.keywordTrends(docs, "year", "text",
      perYearTop = 1)
      .collect().map(r => r.getString(1) -> r.getString(0)).toMap
    assert(out.keySet == Set("microarray", "nanopore"))
    assert(out("microarray") == "declining")
    assert(out("nanopore") == "emerging")
  }

  test("fewer than 2 distinct years yields an empty result") {
    val out = Trends.keywordTrends(
      docs.filter($"year" === 2020L), "year", "text")
    assert(out.count() == 0L)
  }

  test("keywordTrends is invariant to input partitioning") {
    def run(parts: Int) = Trends
      .keywordTrends(docs.repartition(parts), "year", "text")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq.sorted
    assert(run(1) == run(5))
  }

  // --- trendMatch ---

  private val panel = Seq(
    Trends.TrendDef("immuno", "therapy",
      Seq("checkpoint", "pdl1", "car-t"), Seq("PD1"), Seq("immune")),
    Trends.TrendDef("genomics", "profiling",
      Seq("sequencing", "mutation", "genome"), Seq("KRAS"), Seq("dna")))

  test("trendMatch scores the reference's weighted legs and caps at 100") {
    val papers = Seq(
      // checkpoint(15, +20 title) + pdl1(15) + PD1 boundary(10) +
      // immune(8) = 68 → immuno
      (1L, "checkpoint blockade", "pdl1 and pd1 in immune cells"),
      // all genomics legs + all three title bonuses → capped at 100
      (2L, "sequencing mutation genome", "sequencing mutation genome" +
        " kras dna profiles"),
      // 'pd1x' must NOT hit the PD1 boundary regex; score 0 → dropped
      (3L, "pd1x only", "nothing else"),
      // below minScore (mutation 15 body-only) → dropped
      (4L, "irrelevant title", "one mutation mention")
    ).toDF("doc_id", "title", "abstract")
    val out = Trends.trendMatch(papers, "doc_id", "title", "abstract",
      panel)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "immuno")
    assert(out(1L).getLong(3) == 68L)
    assert(out(2L).getString(1) == "genomics")
    assert(out(2L).getLong(3) == 100L)
    assert(out(2L).getString(2) == "profiling")
    assert(!out.contains(3L) && !out.contains(4L))
  }

  // --- validateTrends ---

  private def signal(
      kw: String, g5: Double = 0.0, gy: Double = 0.0, tp: Long = 0L,
      uj: Long = 0L, hj: Long = 0L, sr: Long = 0L, ma: Long = 0L,
      ct: Long = 0L, p3: Long = 0L, gr: Double = 0.0) =
    (kw, g5, gy, tp, uj, hj, sr, ma, ct, p3, gr)

  private val sigCols = Seq("keyword", "growth_rate_5yr",
    "growth_rate_yoy", "total_papers_5yr", "unique_journals",
    "high_if_journals", "systematic_reviews", "meta_analyses",
    "active_clinical_trials", "phase3_trials", "gap_ratio")

  test("validateTrends: ladder boundaries, weights and confidence") {
    val df = Seq(
      // everything maxed: all components 100 → total 100 → high
      signal("hot", g5 = 100, gy = 30, tp = 10000, uj = 50, hj = 5,
        sr = 50, ma = 20, ct = 100, p3 = 10, gr = 10),
      // growth exactly 0 scores NOTHING (strict > 0 branch); gap
      // baseline 10 → total = 10·0.15 = 1.5 → uncertain
      signal("cold"),
      // growth 0.5 hits the >0 branch (10·0.25) + gap 20·0.15 = 5.5
      signal("tiny", g5 = 0.5, gr = 1),
      // boundary: exactly 25 growth → 30 points; exactly 5 journals
      // → 15; total = 30·.25 + 15·.2 + 10·.15 = 12
      signal("edge", g5 = 25, uj = 5)
    ).toDF(sigCols: _*)
    val out = Trends.validateTrends(df)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("hot").getAs[Double]("total_score") - 100.0)
      < 1e-6)
    assert(out("hot").getAs[String]("confidence") == "high")
    assert(math.abs(out("cold").getAs[Double]("total_score") - 1.5)
      < 1e-6)
    assert(out("cold").getAs[String]("confidence") == "uncertain")
    assert(math.abs(out("cold").getAs[Double]("publication_score"))
      < 1e-6)
    assert(math.abs(out("tiny").getAs[Double]("total_score") - 5.5)
      < 1e-6)
    assert(math.abs(out("edge").getAs[Double]("publication_score")
      - 30.0) < 1e-6)
    assert(math.abs(out("edge").getAs[Double]("diversity_score")
      - 15.0) < 1e-6)
  }

  test("trendMatch breaks score ties by definition order") {
    // 'checkpoint sequencing' scores 15+20 on BOTH trends → the
    // first-defined trend (immuno) must win, like the reference's
    // stable sort
    val papers = Seq((9L, "checkpoint sequencing", ""))
      .toDF("doc_id", "title", "abstract")
    val out = Trends.trendMatch(papers, "doc_id", "title", "abstract",
      panel).collect()
    assert(out.head.getString(1) == "immuno")
  }
}
