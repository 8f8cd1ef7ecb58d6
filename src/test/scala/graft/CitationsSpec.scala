package graft

import org.apache.spark.sql.functions._

import graft.operators.Citations

/** Unit specs for the citation landmark ladder, reason selection and
  * trend histogram summary.
  */
class CitationsSpec extends SparkSpec {
  import spark.implicits._

  private def score(year: Int, cites: Long, infl: Long, fields: Long) =
    Seq((year, cites, infl, fields)).toDF("y", "c", "i", "f")
      .select(Citations.landmarkScore(col("y"), col("c"), col("i"),
        col("f"), 2025).as("s"))
      .collect().head.getDouble(0)

  test("landmarkScore walks every velocity rung") {
    // age 5 (year 2020); influential 0, 1 field → +2 field bonus
    assert(score(2020, 2500, 0, 1) == 100.0) // cpy 500 → 100, cap
    assert(score(2020, 1000, 0, 1) == 87.0)  // cpy 200 → 80 + 2 + 5
    assert(score(2020, 500, 0, 1) == 67.0)   // cpy 100 → 60 + 2 + 5
    assert(score(2020, 250, 0, 1) == 42.0)   // cpy 50 → 40 + 2
    assert(score(2020, 100, 0, 1) == 18.0)   // cpy 20 → 16 + 2
  }

  test("landmarkScore bonuses: influential ratio, fields cap, age tiers") {
    // influential ratio: 50/100 → +10
    assert(score(2020, 100, 50, 1) == 28.0)  // 16 + 10 + 2
    // field bonus caps at 10 (6 fields would be 12)
    assert(score(2020, 100, 0, 6) == 26.0)   // 16 + 10
    // age ≥10 & ≥1000 cites → +10 (year 2010, cpy 1000/15=66.7→40)
    assert(score(2010, 1000, 0, 1) == 52.0)  // 40 + 2 + 10
    // age ≥5 & ≥500 (but not the 10/1000 tier) → +5
    assert(score(2018, 500, 0, 1) == 47.0)   // cpy 71 → 40 + 2 + 5
    // total caps at 100
    assert(score(2010, 20000, 20000, 5) == 100.0)
  }

  test("landmarkReasons: order preserved, capped at 4, fallback fires") {
    def reasons(year: Int, cites: Long, infl: Long, fields: Long,
        oa: Boolean) =
      Seq((year, cites, infl, fields, oa)).toDF("y", "c", "i", "f", "o")
        .select(Citations.landmarkReasons(col("y"), col("c"), col("i"),
          col("f"), col("o"), 2025).as("r"))
        .collect().head.getString(0)
    // everything fires → first 4 in reference order kept
    assert(reasons(2010, 20000, 200, 5, oa = true) ==
      "exceptional_citations;high_velocity;influential_citations;" +
        "cross_disciplinary")
    // 10000 rung downgrades to highly_cited below the cut
    assert(reasons(2010, 5000, 0, 1, oa = false) ==
      "highly_cited;high_velocity;foundational")
    // nothing fires → fallback
    assert(reasons(2024, 10, 0, 1, oa = false) ==
      "significant_contribution")
    // open access alone
    assert(reasons(2024, 10, 0, 1, oa = true) == "open_access")
  }

  test("yearlyTrends: peak ties go to the earliest year") {
    val edges = Seq(
      (1L, 2020L), (1L, 2020L), (1L, 2022L), (1L, 2022L), (1L, 2021L),
      (2L, 2019L)).toDF("target", "cyear")
    val out = Citations.yearlyTrends(edges, "target", "cyear")
      .collect().map(r => r.getAs[Long]("target") -> r).toMap
    val t1 = out(1L)
    assert(t1.getAs[Long]("total_sampled") == 5L)
    assert(t1.getAs[Long]("peak_year") == 2020L) // tie 2020/2022 → 2020
    assert(t1.getAs[Long]("peak_count") == 2L)
    assert(t1.getAs[Long]("n_years") == 3L)
    assert(out(2L).getAs[Long]("peak_year") == 2019L)
  }

  test("relatedPapers: center excluded, dup keeps max relevance, top-N") {
    val cands = Seq(
      (42L, "cites_this", 999L),     // center → excluded
      (7L, "cites_this", 100L),      // dup of 7 …
      (7L, "cited_by_this", 300L),   // … higher relevance wins
      (8L, "cites_this", 200L),
      (9L, "cited_by_this", 50L))
      .toDF("paper_id", "relation", "relevance")
    val out = Citations.relatedPapers(cands, centerId = 42, topN = 2)
      .collect()
    assert(out.map(_.getAs[Long]("paper_id")).toSeq == Seq(7L, 8L))
    assert(out.head.getAs[String]("relation") == "cited_by_this")
    assert(out.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L))
  }

  test("cite_landmark plan is a pure projection (no shuffle before sort)") {
    val df = SparkEntry.queries("cite_landmark")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"))
    assert(df.count() > 0)
  }

  test("paperQualityRank: piecewise ladders hit every boundary") {
    // (doc_id, year, citations, fulltext, chunks)
    val papers = Seq(
      (1L, 2024L, 0L, true, 10L),     // cite 0; age 1 → 30; ft 20+3
      (2L, 2023L, 9L, true, 25L),     // 9*2=18; age 2 → 27; 20+5
      (3L, 2022L, 10L, true, 60L),    // 20; age 3 → 24; 20+7
      (4L, 2021L, 99L, true, 120L),   // 20+89*.11=29.79→29.8; age 4 → 20; 20+10
      (5L, 2018L, 100L, false, 10L),  // 30; age 7 → 15; abstract 10
      (6L, 2010L, 999L, true, 10L),   // 30+899*.011=39.889→39.9; age 15 → 10
      (7L, 2000L, 1000L, true, 10L),  // 40; age 25 → floor 5
      (8L, 0L, 50L, true, 10L))       // unknown year → neutral 15
      .toDF("doc_id", "year", "citation_count", "has_fulltext",
        "chunk_count")
    val out = Citations.paperQualityRank(papers, 2025, 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("citation_score"),
          r.getAs[Double]("recency_score"),
          r.getAs[Double]("content_score"),
          r.getAs[Double]("quality_score"))).toMap
    assert(out(1L) == ((0.0, 30.0, 23.0, 53.0)))
    assert(out(2L) == ((18.0, 27.0, 25.0, 70.0)))
    assert(out(3L) == ((20.0, 24.0, 27.0, 71.0)))
    assert(out(4L) == ((29.8, 20.0, 30.0, 79.8)))
    assert(out(5L) == ((30.0, 15.0, 10.0, 55.0)))
    assert(out(6L) == ((39.9, 10.0, 23.0, 72.9)))
    assert(out(7L) == ((40.0, 5.0, 23.0, 68.0)))
    assert(out(8L) == ((24.4, 15.0, 23.0, 62.4)))
  }
}
