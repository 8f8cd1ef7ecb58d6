package graft

import graft.operators.Validate

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  // paper p: two chunks; summary = unit-x vector → cosines 1.0 and
  // 0.0 → avg 0.5, max 1.0
  private val chunks = Seq(
    ("p", Seq(2.0f, 0.0f)), ("p", Seq(0.0f, 3.0f))
  ).toDF("paper", "vec")
  private val summaries = Seq(("p", Seq(1.0f, 0.0f)))
    .toDF("paper", "vec")
  // original words (4+ chars, stopword 'with' dropped):
  // {tumor, growth, markers, genome} ; summary covers {tumor, genome}
  // → coverage 0.5
  private val chunkTexts = Seq(
    ("p", "tumor growth with dna"), ("p", "markers genome")
  ).toDF("paper", "text")
  private val summaryTexts = Seq(
    ("p", "tumor genome with dna ab")
  ).toDF("paper", "text")

  test("summaryValidate reproduces the reference's weighted rollup") {
    val r = Validate.summaryValidate(chunks, summaries, chunkTexts,
      summaryTexts, "paper", "vec", "text").collect()
    assert(r.length == 1)
    val row = r.head
    val sim = row.getAs[Double]("similarity_score")
    val cov = row.getAs[Double]("coverage_score")
    val con = row.getAs[Double]("consistency_score")
    val all = row.getAs[Double]("overall_confidence")
    assert(math.abs(sim - 50.0) < 1e-6)          // avg(1, 0)·100
    assert(math.abs(cov - 50.0) < 1e-6)          // 2 of 4 words
    assert(math.abs(con - 80.0) < 1e-6)          // (1·.6 + .5·.4)·100
    // 50·.4 + 50·.3 + 80·.3 = 59
    assert(math.abs(all - 59.0) < 1e-6)
  }

  test("summary sharing no words scores zero coverage") {
    val st = Seq(("p", "unrelated phrasing entirely"))
      .toDF("paper", "text")
    val r = Validate.summaryValidate(chunks, summaries, chunkTexts,
      st, "paper", "vec", "text").collect().head
    assert(math.abs(r.getAs[Double]("coverage_score") - 0.0) < 1e-6)
  }
}
