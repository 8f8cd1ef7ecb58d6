package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for bounded top-k aggregation. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregator by (score DESC, id ASC).
  *
  * The scale rationale: used as `groupBy(query).agg(topk(...))`, Spark
  * plans an ObjectHashAggregate with PARTIAL mode on the map side, so
  * each map partition reduces its candidates into a buffer of at most
  * `k` rows BEFORE the exchange — the shuffle then carries
  * O(numQueries * k * mapPartitions) rows instead of the full scored
  * cross product. This is the exchange-free "local prune" that a
  * Window.partitionBy(query, partition_id) approach cannot provide
  * (the window itself hashes the full input first).
  *
  * Determinism: the buffer keeps the k smallest elements under the
  * total order (score DESC, id ASC); merge order cannot change the
  * result of a bounded selection under a total order. The order is
  * total even for NaN — and NaN sorts LAST, not first: callers guard
  * null/zero-norm vectors, but an embedding containing NaN/Inf values
  * passes those guards with a NaN cosine, and under plain
  * Double.compare that row would deterministically occupy the top of
  * every top-k result. A garbage score must lose to every real score.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def lt(a: ScoredId, b: ScoredId): Boolean = {
    val aNaN = a.score.isNaN
    val bNaN = b.score.isNaN
    if (aNaN != bNaN) bNaN // non-NaN wins; NaN-vs-NaN falls through to id
    else {
      val c = java.lang.Double.compare(a.score, b.score)
      c > 0 || (c == 0 && a.id < b.id)
    }
  }

  private def bounded(s: Seq[ScoredId]): Seq[ScoredId] =
    s.sortWith(lt).take(k)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.length >= k && b.nonEmpty && lt(b.last, a)) b else bounded(b :+ a)

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    bounded(b1 ++ b2)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = bounded(r)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
