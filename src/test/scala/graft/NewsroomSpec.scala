package graft

import org.apache.spark.sql.functions._

import graft.operators.Newsroom

/** Unit specs for the daily-briefing prioritizer re-expression,
  * replaying the reference's own __main__ fixture
  * (bio-daily-briefing/src/prioritizer.py:360-408) through the
  * reference weight panel.
  */
class NewsroomSpec extends SparkSpec {
  import spark.implicits._

  // the reference's test fixture, with days_old pinned (the reference
  // derives it from datetime.now(); 2025-01-05 was "days_old >= 4"
  // at the time the fixture would matter, so recency adds 0 here)
  private val fixture = Seq(
    (1L, "FDA", "drug_approval",
      "fda approves first glp-1 drug for obesity " +
        "first breakthrough approval for weight loss", "none", 9),
    (2L, "ClinicalTrials", "phase3_positive",
      "pfizer phase 3 trial shows positive results " +
        "cancer immunotherapy trial success", "none", 9),
    (3L, "PubMed", "research",
      "crispr gene editing study novel gene editing approach",
      "nature", 9)
  ).toDF("id", "news_source", "news_type", "text", "journal",
    "days_old")

  private def scored = Newsroom.priorityScore(
    fixture, "news_source", "news_type", "text", "journal", "days_old",
    Newsroom.ReferencePanel)

  test("priorityScore reproduces the reference fixture scores") {
    val out = scored.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("priority_score"))
      .toMap
    // FDA 100 + drug_approval 150 + glp-1 30 + first/breakthrough 50
    assert(out(1L) == 330L)
    // ClinicalTrials 80 + phase3_positive 140 + pfizer 25
    assert(out(2L) == 245L)
    // PubMed 60 + research 50 + crispr 30 + nature 40 + novel 50
    assert(out(3L) == 230L)
  }

  test("each bonus fires at most once (reference breaks on first hit)") {
    val multi = Seq((1L, "X", "research",
      "glp-1 and crispr and car-t all present", "none", 9))
      .toDF("id", "news_source", "news_type", "text", "journal",
        "days_old")
    val s = Newsroom.priorityScore(multi, "news_source", "news_type",
        "text", "journal", "days_old", Newsroom.ReferencePanel)
      .collect().head.getAs[Long]("priority_score")
    // default 20 + research 50 + ONE hot-keyword bonus 30
    assert(s == 100L)
  }

  test("recency tiers: 0 → +30, 1 → +20, 2-3 → +10, 4+ → +0") {
    val rows = Seq(0, 1, 2, 3, 4, 5).map(d => (d.toLong, d))
      .toDF("id", "days_old")
      .withColumn("news_source", lit("X"))
      .withColumn("news_type", lit("x"))
      .withColumn("text", lit("")).withColumn("journal", lit(""))
    val out = Newsroom.priorityScore(rows, "news_source", "news_type",
        "text", "journal", "days_old", Newsroom.ReferencePanel)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("priority_score"))
      .toMap
    val base = 20L + 10L // default source + default type
    assert(out(0L) == base + 30 && out(1L) == base + 20)
    assert(out(2L) == base + 10 && out(3L) == base + 10)
    assert(out(4L) == base && out(5L) == base)
  }

  test("categorize maps sources and preprint types like the reference") {
    val rows = Seq(
      ("FDA", "drug_approval", "regulatory"),
      ("ClinicalTrials", "new_trial", "clinical"),
      ("bioRxiv", "research", "preprints"),
      ("medRxiv", "research", "preprints"),
      ("SomeBlog", "preprint_repost", "preprints"),
      ("PubMed", "research", "research"))
    val out = Newsroom.categorize(
      rows.toDF("news_source", "news_type", "want"),
      "news_source", "news_type").collect()
    out.foreach(r =>
      assert(r.getAs[String]("category") == r.getAs[String]("want"),
        s"${r.getAs[String]("news_source")}"))
  }

  test("headline ladder falls through rungs in reference order") {
    def pick(rows: Seq[(Long, String, String, Long)]): Long = {
      val df = rows.toDF("id", "news_type", "category", "priority_score")
      Newsroom.selectHeadline(df, "id", "news_type", "category")
        .collect().head.getAs[Long]("id")
    }
    // an approval beats a higher-scored warning (rung 1 < rung 2)
    assert(pick(Seq(
      (1L, "drug_approval", "regulatory", 100L),
      (2L, "safety_warning", "regulatory", 999L))) == 1L)
    // no regulatory rungs → phase3 positive beats plain clinical
    assert(pick(Seq(
      (1L, "new_trial", "clinical", 999L),
      (2L, "phase3_positive", "clinical", 100L))) == 2L)
    // research outranks preprints; regulatory designation is the
    // last-resort rung 7
    assert(pick(Seq(
      (1L, "designation", "regulatory", 999L),
      (2L, "preprint", "preprints", 999L),
      (3L, "research", "research", 10L))) == 3L)
    // within a rung, highest priority wins, id breaks ties
    assert(pick(Seq(
      (1L, "research", "research", 50L),
      (2L, "research", "research", 70L),
      (3L, "research", "research", 70L))) == 2L)
  }

  test("news_priority plan is narrow: no exchange before the sort") {
    val df = SparkEntry.queries("news_priority")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // scoring is pure per-row projection; the only wide step is the
    // final presentation sort
    assert(!plan.contains("HashAggregate"))
    assert(df.count() > 0)
  }
}
