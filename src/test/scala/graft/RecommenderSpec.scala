package graft

import org.apache.spark.sql.functions._

import graft.operators.Recommender

/** Unit specs for the enhanced recommender's ladders, type
  * precedence, gates and balanced selection
  * (paper_recommender.py:552,616,667,893).
  */
class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  private def classify(
      c: Long, year: Long, infl: Long): (String, Boolean) = {
    val row = Seq((c, year, infl)).toDF("c", "y", "i")
      .withColumn("v", Recommender.citationVelocity(col("c"), col("y"), 2025))
      .select(
        Recommender.classifyPaperType(col("c"), col("v"), col("i"),
          col("y"), 2025).as("t"),
        Recommender.passesQualityGate(
          Recommender.classifyPaperType(col("c"), col("v"), col("i"),
            col("y"), 2025),
          col("c"), col("v"), 50, 15).as("g"))
      .collect().head
    (row.getString(0), row.getBoolean(1))
  }

  test("classifyPaperType walks the precedence ladder") {
    assert(classify(0, 2024, 5) == (("unknown", false)))   // uncited beats influential
    assert(classify(60, 2020, 0) == (("classic", true)))   // age 5, 60 >= 50
    assert(classify(35, 2020, 0) == (("likely_classic", true))) // 35 >= 25 relaxed
    assert(classify(40, 2024, 0) == (("breakthrough", true)))   // v 40 >= 15
    assert(classify(12, 2024, 0) == (("breakthrough", false)))  // v 12 < 15 gate
    assert(classify(4, 2024, 3) == (("breakthrough", false)))   // influential path
    // age 3 escapes the classic rungs only below 30 cites
    assert(classify(12, 2022, 0) == (("likely_breakthrough", false))) // v 4 < 7.5
    assert(classify(25, 2022, 0) == (("likely_breakthrough", true))) // v 8.33
    // unknown fallback gate: 20 cites or velocity 10
    assert(classify(25, 2005, 0) == (("unknown", true)))
    assert(classify(8, 2005, 0) == (("unknown", false)))
  }

  test("velocityScore piecewise boundaries") {
    val out = Seq(0.0, 4.0, 5.0, 19.0, 20.0, 49.0, 50.0).toDF("v")
      .select(round(Recommender.velocityScore(col("v")) + lit(1e-9), 2)
        .as("s")).collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(0.0, 8.0, 10.0, 19.38, 20.0, 29.57, 30.0))
  }

  test("estimatedQuality: journal bonus gates the old-paper bonus") {
    val out = Seq(
      (true, 2024L), (true, 2010L), (false, 2010L), (false, 2024L))
      .toDF("j", "y")
      .select(Recommender.estimatedQuality(col("j"), col("y"), 2025)
        .as("q")).collect().map(_.getDouble(0)).toSeq
    // +5 recent; journal 80 + 10 old; plain 50 never gets +10
    assert(out == Seq(85.0, 90.0, 50.0, 55.0))
  }

  test("balancedSelect: 3+3 with best-available fill, gate-or-60 filter") {
    // 2 classics, 1 breakthrough -> quota 3 filled from leftovers
    val papers = Seq(
      (1L, "classic", 90.0, true),
      (2L, "classic", 80.0, true),
      (3L, "breakthrough", 85.0, true),
      (4L, "unknown", 70.0, false),   // kept by >=60
      (5L, "unknown", 95.0, true),    // best leftover
      (6L, "unknown", 50.0, false),   // dropped: fails both
      (7L, "likely_classic", 65.0, false), // kept, 4th classic-bucket
      (8L, "unknown", 62.0, false))
      .toDF("doc_id", "paper_type", "quality_score", "passes_gate")
    val out = Recommender.balancedSelect(papers, "doc_id", 6)
      .select("doc_id", "bucket", "brn")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // classics 1,2,7 (quality order 90,80,65); breakthrough 3;
    // fill quota 6-4=2: leftovers by quality 95(5), 70(4)
    assert(out == Seq((1L, 0, 1), (2L, 0, 2), (7L, 0, 3),
      (3L, 1, 1), (5L, 2, 1), (4L, 2, 2)))
  }
}
