package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Batched text-pair scoring plumbing — the Spark-side contract of
  * the reference's cross-encoder rerank stage (reference:
  * backend/app/core/core_paper_reranker.py:33 loads a cross-encoder
  * and scores (query, passage) pairs in batches). The MODEL call is
  * STUBBED (this container has no ML runtime) behind
  * `FakeCrossScorer` — a deterministic token-overlap stand-in — but
  * the Spark plumbing is real: typed rows, fixed-size batch iteration
  * inside mapPartitions (the shape a model server / ONNX session
  * call needs), alignment enforced between a batch and its scores,
  * and no shuffle of the text payloads (scoring is narrow; only
  * (pair_id, score) flows downstream).
  *
  * This completes the rerank story the way Multimodal.FakeDecoder
  * completes the media pipeline: swap the stub for the real model
  * call, everything around it is production shape.
  */
object CrossScore {

  /** One (query, passage) scoring unit. */
  case class TextPair(pair_id: Long, query: String, passage: String)

  /** Scored output — deliberately slim so the wide text columns stop
    * at the scoring stage instead of flowing through later joins.
    */
  case class ScoredPair(pair_id: Long, score: Double)

  /** The production scorer contract: ONE vectorized model call per
    * batch — pairs in, aligned scores out (same length, same order).
    */
  type BatchScorer = Seq[TextPair] => Seq[Double]

  /** STUB scorer: deterministic normalized token-overlap (Jaccard of
    * lowercase whitespace token sets) standing in for cross-encoder
    * logits. Replace with the real batched model call; the signature
    * is the production contract.
    */
  val FakeCrossScorer: BatchScorer = batch => batch.map { p =>
    val q = TextFns.lcRoot(p.query).split("\\s+").filter(_.nonEmpty).toSet
    val d = TextFns.lcRoot(p.passage).split("\\s+").filter(_.nonEmpty).toSet
    val union = (q ++ d).size
    if (union == 0) 0.0 else q.intersect(d).size.toDouble / union
  }

  /** Batch-shaped pair scoring: partitions iterate in fixed-size
    * batches, each batch scored by ONE scorer call. Narrow — pairs
    * never shuffle; a scorer returning a misaligned score vector
    * fails fast instead of silently mis-assigning scores.
    */
  def scorePairs(
      pairs: Dataset[TextPair], scorer: BatchScorer,
      batchSize: Int = 32): Dataset[ScoredPair] = {
    require(batchSize > 0, "batchSize must be positive")
    import pairs.sparkSession.implicits._
    pairs.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val scores = scorer(batch)
        require(scores.length == batch.length,
          s"scorer returned ${scores.length} scores for ${batch.length} pairs")
        batch.lazyZip(scores).map((p, s) => ScoredPair(p.pair_id, s))
      }
    }
  }

  /** Rerank composition: first-stage candidates (id, text) are paired
    * against the query text, batch-scored, and re-ranked by the
    * cross score with id tiebreak. The first stage already pruned to
    * a candidate list, so the ORDER BY ... LIMIT plans as
    * TakeOrderedAndProject over ≤candidates rows.
    */
  def rerankTopK(
      candidates: Dataset[(Long, String)], queryText: String,
      scorer: BatchScorer, k: Int, batchSize: Int = 32): Dataset[ScoredPair] = {
    import candidates.sparkSession.implicits._
    val pairs = candidates.map { case (id, text) =>
      TextPair(id, queryText, text)
    }
    scorePairs(pairs, scorer, batchSize)
      .orderBy(col("score").desc, col("pair_id"))
      .limit(k)
  }
}
