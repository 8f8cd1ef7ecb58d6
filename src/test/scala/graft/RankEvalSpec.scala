package graft

import graft.operators.RankEval

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def run(ids: Long*) =
    ids.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      .toDF("doc_id", "rank")

  test("a perfect ranking scores ndcg = 1 at every depth") {
    val grades = Seq((1L, 3), (2L, 2), (3L, 1), (4L, 0)).toDF("doc_id", "rel")
    val out = RankEval.ndcgAtK(run(1L, 2L, 3L, 4L), grades,
      "doc_id", "rank", "rel", 4)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Double]("ndcg"))
      .toMap
    (1L to 4L).foreach(r => assert(out(r) == 1.0, s"rank $r"))
  }

  test("an inverted ranking scores below 1 and recovers with depth") {
    val grades = Seq((1L, 3), (2L, 2), (3L, 1), (4L, 0)).toDF("doc_id", "rel")
    val out = RankEval.ndcgAtK(run(4L, 3L, 2L, 1L), grades,
      "doc_id", "rank", "rel", 4)
      .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Double]("ndcg"))
      .toMap
    assert(out(1L) == 0.0)          // rank 1 has the grade-0 doc
    assert(out(2L) > 0.0 && out(2L) < 1.0)
    assert(out(4L) > out(2L) && out(4L) < 1.0)
  }

  test("docs absent from the grade table score 0; ideal uses the corpus") {
    val grades = Seq((1L, 2), (9L, 3)).toDF("doc_id", "rel") // 9 never retrieved
    val out = RankEval.ndcgAtK(run(1L, 2L), grades,
      "doc_id", "rank", "rel", 2)
      .collect().map(r => r.getAs[Long]("rank") ->
        (r.getAs[Long]("grade"), r.getAs[Double]("ndcg"))).toMap
    assert(out(1L)._1 == 2L)
    assert(out(2L)._1 == 0L)
    // ideal@1 = grade-3 doc the run missed, so ndcg@1 = 3/7
    assert(out(1L)._2 == 0.428571)
  }

  test("all-zero grades yield null ndcg, not a divide-by-zero") {
    val grades = Seq((1L, 0), (2L, 0)).toDF("doc_id", "rel")
    val rows = RankEval.ndcgAtK(run(1L, 2L), grades,
      "doc_id", "rank", "rel", 2).collect()
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("ndcg"))))
  }
}
