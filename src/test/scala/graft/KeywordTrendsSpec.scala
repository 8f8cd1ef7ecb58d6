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
}
