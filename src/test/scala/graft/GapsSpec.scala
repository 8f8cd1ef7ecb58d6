package graft

import org.apache.spark.sql.functions._

import graft.operators.Gaps

/** Unit specs for the research-gaps ladder and coverage cuts,
  * including the rungs the sf0.01 binding never reaches.
  */
class GapsSpec extends SparkSpec {
  import spark.implicits._

  test("priorityScore hits every evidence and volume rung") {
    val cases = Seq(
      // (evidence, total) → expected score
      (3L, 50L),    // ev<5 → 30; vol<100 → 90; ratio .06 → 60
      (10L, 50L),   // ev<20 → 80; ratio .2 → 100
      (30L, 400L),  // ev<50 → 60; vol<500 → 70; ratio .075 → 75
      (80L, 1000L), // ev≥50 → 40; vol<2000 → 50; ratio .08 → 80
      (100L, 5000L) // vol≥2000 → 30; ratio .02 → 20
    ).toDF("ev", "total")
    val out = cases.select(col("ev"),
      Gaps.priorityScore(col("ev") / col("total"), col("ev"),
        col("total")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(3L) == 60.0 * 0.4 + 30 * 0.35 + 90 * 0.25)   // 57.0
    assert(out(10L) == 100 * 0.4 + 80 * 0.35 + 90 * 0.25)   // 90.5
    assert(out(30L) == 75 * 0.4 + 60 * 0.35 + 70 * 0.25)    // 68.5
    assert(out(80L) == 80 * 0.4 + 40 * 0.35 + 50 * 0.25)    // 58.5
    assert(out(100L) == 20 * 0.4 + 40 * 0.35 + 30 * 0.25)   // 29.5
  }

  test("analyze: OR'd patterns count a doc once; ratio uses the corpus total") {
    val docs = Seq(
      "alpha unresolved question",
      "beta remains unclear and unresolved", // both patterns, 1 doc
      "gamma plain text",
      "delta remains unclear").toDF("text")
    val out = Gaps.analyze(docs, "text", Gaps.GapPanel(Seq(
      "open_q" -> Seq("unresolved", "remains unclear"),
      "none" -> Seq("zzz_never")))).collect()
    val byType = out.map(r => r.getAs[String]("gap_type") -> r).toMap
    assert(byType("open_q").getAs[Long]("evidence_count") == 3L)
    assert(byType("open_q").getAs[Double]("gap_ratio") == 0.75)
    assert(byType("none").getAs[Long]("evidence_count") == 0L)
    assert(byType.values.forall(_.getAs[Long]("total_papers") == 4L))
  }

  test("understudied keeps only <5% coverage with >=10 combined hits") {
    // 200 base docs; modifier m1 co-occurs 9× (fails min), m2 11×
    // (0.055 — fails coverage), m3 8×... build exact counts
    val rows =
      (1 to 9).map(_ => "base m1") ++
      (1 to 11).map(_ => "base m2") ++          // 11/200 = .055 ≥ .05
      (1 to 9).map(_ => "base m3 filler") ++    // 9 < 10
      (1 to 10).map(_ => "base m4") ++          // 10/200 = .05 — not < .05
      (1 to 10).map(_ => "base m5") :+           // 10 exactly → fails
      "zzz m1 m2 m3 m4 m5"                       // no base term
    val pad = (rows.size until 201).map(i => s"base filler$i")
    val docs = (rows ++ pad).toDF("text")
    assert(docs.where(col("text").contains("base")).count() == 200)
    val out = Gaps.understudied(docs, "text", "base",
      Seq("m1", "m2", "m3", "m4", "m5"), minCombined = 9,
      maxCoverage = 0.05)
    val kept = out.collect().map(_.getAs[String]("topic_combination"))
    // m1: 9/200 = .045 <.05, ≥9 → kept; m3: 9 → kept;
    // m2: .055 → dropped; m4/m5: .05 not < .05 → dropped
    assert(kept.toSet == Set("base + m1", "base + m3"))
    val m1 = out.where(col("topic_combination") === "base + m1")
      .collect().head
    assert(m1.getAs[Double]("coverage_ratio") == 0.045)
    assert(m1.getAs[Double]("opportunity_score") == 95.5)
  }

  test("matrix: first pattern only, top flag breaks ties in panel order") {
    val docs = Seq(
      "topic p1a", "topic p1a", "topic p2a", "topic p2a",
      "topic p1b only second pattern", "topic plain", "no-match p1a")
      .toDF("text")
    val out = Gaps.matrix(docs, "text", "topic", Gaps.GapPanel(Seq(
      "t1" -> Seq("p1a", "p1b"), // first pattern only → 2, not 3
      "t2" -> Seq("p2a")))).collect()
    val byType = out.map(r => r.getAs[String]("gap_type") -> r).toMap
    assert(byType("t1").getAs[Long]("count") == 2L)
    assert(byType("t2").getAs[Long]("count") == 2L)
    // tie at 2 → first panel entry wins the top flag
    assert(byType("t1").getAs[Boolean]("is_top"))
    assert(!byType("t2").getAs[Boolean]("is_top"))
    assert(byType("t1").getAs[Double]("percentage") == 33.33)
  }

  test("emergingQuestions: first match per pattern, length cut, dedup") {
    val docs = Seq(
      (1L, "whether this treatment works wonders. " +
        "whether another thing entirely."), // 2 matches → first only
      (2L, "whether short."),               // ≤20 chars → dropped
      (3L, "whether this treatment works wonders again")
    ).toDF("doc_id", "text")
    val out = Gaps.emergingQuestions(docs, "doc_id", "text",
      Seq(("whether [a-z ]{6,30} w", "exploratory")), minLen = 20)
      .collect()
    // doc 1 contributes ONE question; doc 3's match equals doc 1's
    // ("whether this treatment works w") → deduped, first doc wins
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_id") == 1L)
    assert(out.head.getAs[String]("question")
      .startsWith("What whether this treatment works w"))
    assert(out.head.getAs[Double]("relevance") == 0.7)
  }

  test("analyze plan: one scan, no join, map-side partial aggregate") {
    val df = SparkEntry.queries("gap_analyze")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1)
    assert(df.count() == 4)
  }
}
