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

  // --- claimValidate ---

  // 4 chunks in 2 papers along axes: c1/c2 match the claim (cos 1),
  // c3 orthogonal (cos 0 → conflicting), c4 diagonal (cos ≈ .707)
  private val corpus = Seq(
    (1L, 10L, Seq(1.0f, 0.0f)), (2L, 10L, Seq(2.0f, 0.0f)),
    (3L, 20L, Seq(0.0f, 1.0f)), (4L, 20L, Seq(1.0f, 1.0f))
  ).toDF("vec_id", "paper", "embedding")

  test("claimValidate: support/conflict split and normalized coverage") {
    val claims = Seq((7L, Seq(1.0f, 0.0f))).toDF("claim_id", "qe")
    val r = Validate.claimValidate(corpus, claims, "vec_id",
      "embedding", "paper", "claim_id", "qe",
      topK = 4, paperNorm = 2).collect().head
    assert(r.getAs[Long]("n_supporting") == 3L)  // cos 1, 1, .707
    assert(r.getAs[Long]("n_conflicting") == 1L) // cos 0
    assert(r.getAs[Long]("n_unique_papers") == 2L)
    // avg = (1 + 1 + .707107 + 0)/4 = .676777 → sim 67.6777
    assert(math.abs(r.getAs[Double]("similarity_score") - 67.677675)
      < 1e-4)
    // coverage: 2 papers / max(4/2, 1) = 1 → 100
    assert(math.abs(r.getAs[Double]("coverage_score") - 100.0) < 1e-6)
    // consistency: 3/4 → 75
    assert(math.abs(r.getAs[Double]("consistency_score") - 75.0) < 1e-6)
  }

  // --- crossValidate ---

  test("crossValidate: self-chunks drop; fixed /topAvg divisor") {
    // paper 10's rep = x-axis; paper 20's rep = y-axis
    val reps = Seq(
      (10L, Seq(1.0, 0.0)), (20L, Seq(0.0, 1.0))
    ).toDF("paper", "centroid")
    val out = Validate.crossValidate(corpus, reps, "vec_id",
      "embedding", "paper", "paper", "centroid",
      topK = 4, topAvg = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // paper 10 vs others (c3 cos 0, c4 cos .707107):
    //   overall = (.707107 + 0)/2·100 = 35.3554 (divisor 2 even
    //   though only 2 survive), max = .707107, avg = .353554,
    //   supporters(> .5): paper 20 → 1/2 papers = 50
    val p10 = out(10L)
    assert(math.abs(p10.getAs[Double]("overall_confidence") - 35.35535)
      < 1e-3)
    assert(math.abs(p10.getAs[Double]("similarity_score") - 70.7107)
      < 1e-3)
    assert(math.abs(p10.getAs[Double]("coverage_score") - 50.0) < 1e-6)
    // paper 20's c4 is its OWN chunk — self-filtered; the cross hits
    // (c1, c2, both paper 10) are orthogonal to the y-axis rep
    val p20 = out(20L)
    assert(math.abs(p20.getAs[Double]("similarity_score") - 0.0) < 1e-6)
    assert(math.abs(p20.getAs[Double]("coverage_score") - 0.0) < 1e-6)
  }

  // --- vocabMatch ---

  test("vocabMatch: class weights, boundary abbreviations, clamping") {
    import graft.operators.TextAnalysis
    val panel = TextAnalysis.VocabPanel("glioma", Seq("brain tumor"),
      Seq("GBM"), Seq("temozolomide"), Seq("meningioma"))
    // max_possible = 1 + 0.9 + 0.85 = 2.75
    val docs = Seq(
      // all positives: 1 + .9 + .85 + .5 = 3.25 → clamps to 1.0
      (1L, "Glioma and brain tumor GBM treated with temozolomide"),
      // abbreviation INSIDE a word must not match (\b); 'gbmx' ≠ GBM
      (2L, "gbmx study"),
      // exclusion only: raw −0.5 → score clamps to 0
      (3L, "meningioma cohort"),
      (4L, "unrelated")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.vocabMatch(docs, "doc_id", "text", panel)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(math.abs(m(1L).getAs[Double]("raw_score") - 3.25) < 1e-6)
    assert(math.abs(m(1L).getAs[Double]("score") - 1.0) < 1e-6)
    assert(m(1L).getAs[Boolean]("has_primary"))
    assert(m(2L).getAs[Long]("n_matches") == 0L)
    assert(math.abs(m(3L).getAs[Double]("raw_score") + 0.5) < 1e-6)
    assert(math.abs(m(3L).getAs[Double]("score") - 0.0) < 1e-6)
    assert(m(3L).getAs[Boolean]("has_exclusion"))
    assert(m(4L).getAs[Long]("n_matches") == 0L)
  }
}
