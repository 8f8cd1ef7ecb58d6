package graft

import graft.operators.CrossScore
import graft.operators.CrossScore.{BatchScorer, TextPair}

class CrossScoreSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(n: Int) = spark.createDataset(
    (0 until n).map(i => TextPair(i.toLong, "spark join fast", s"doc $i join")))

  test("scorePairs batches the partition iterator at the configured size") {
    // scorer encodes each batch's size into its scores: with 10 rows
    // in ONE partition and batchSize 4 the batches must be 4,4,2
    val sizeScorer: BatchScorer = b => b.map(_ => b.length.toDouble)
    val out = CrossScore.scorePairs(pairs(10).repartition(1), sizeScorer, 4)
      .collect().sortBy(_.pair_id).map(_.score.toInt).toSeq
    assert(out == Seq(4, 4, 4, 4, 4, 4, 4, 4, 2, 2))
  }

  test("scorePairs is deterministic and keeps pair ids aligned") {
    val a = CrossScore.scorePairs(pairs(7), CrossScore.FakeCrossScorer, 3)
      .collect().sortBy(_.pair_id).toSeq
    val b = CrossScore.scorePairs(pairs(7), CrossScore.FakeCrossScorer, 3)
      .collect().sortBy(_.pair_id).toSeq
    assert(a == b)
    assert(a.map(_.pair_id) == (0L until 7L))
    // overlap stub: "spark join fast" vs "doc i join" shares {join}
    // -> 1 / |{spark,join,fast,doc,i}| = 0.2
    assert(a.forall(s => math.abs(s.score - 0.2) < 1e-9))
  }

  test("a misaligned scorer fails fast instead of mis-assigning scores") {
    val broken: BatchScorer = b => b.map(_ => 1.0).drop(1)
    val ex = intercept[org.apache.spark.SparkException] {
      CrossScore.scorePairs(pairs(5), broken, 5).collect()
    }
    assert(ex.getMessage.contains("scorer returned")
      || Option(ex.getCause).exists(_.getMessage.contains("scorer returned")))
  }

  test("rerankTopK orders by cross score with id tiebreak") {
    val cands = spark.createDataset(Seq(
      (1L, "completely unrelated text"),
      (2L, "spark join fast exactly"),
      (3L, "spark join fast"),
      (4L, "join only here")))
    val top = CrossScore.rerankTopK(cands, "spark join fast",
      CrossScore.FakeCrossScorer, 3, 2).collect().toSeq
    // 3 is a perfect overlap (1.0), 2 shares 3 of 4 union tokens
    // (0.75), 4 shares 1 of 5 (0.2); 1 scores 0 and is cut
    assert(top.map(_.pair_id) == Seq(3L, 2L, 4L))
    assert(top.head.score == 1.0)
  }
}
