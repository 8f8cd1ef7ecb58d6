package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — NDCG@k of a ranked run against graded
  * relevance labels, the metric loop a retrieval stack (BM25 / dense /
  * hybrid / reranked) is tuned by. The reference ships retrieval but
  * no measurement; this closes that loop, complementing AnnRecallSpec
  * (recall of ANN vs exact) with a graded-relevance metric on the
  * query surface itself.
  */
object RankEval {

  /** Cumulative NDCG@r, r = 1..k, for one ranked run.
    *
    * Inputs: `run` (idCol, rankCol 1-based — already top-k pruned by
    * whatever search produced it) and `grades` (idCol, gradeCol — a
    * non-negative integer relevance grade per doc). Run rows without
    * a grade row score 0. Gains are (2^grade − 1), discounts
    * ln(rank+1)/ln(2) — the textbook formulation, kept textually
    * identical in the oracle so cumulative float sums agree
    * bit-for-bit (both engines fold in rank order).
    *
    * The ideal ranking is corpus-wide: top-k grades (grade desc, id
    * asc tiebreak) — one narrow scan + TakeOrderedAndProject at any
    * corpus size. Both cumulative windows then run on ≤ k rows, so
    * their partition-less frames are driver-scale by construction.
    * A zero IDCG (no relevant docs anywhere) yields NULL ndcg rather
    * than an ANSI divide-by-zero.
    *
    * Output: (rank, idCol, grade, dcg, idcg, ndcg) — ndcg at row r is
    * NDCG@r, so one result carries the whole metric curve.
    */
  def ndcgAtK(
      run: DataFrame, grades: DataFrame,
      idCol: String, rankCol: String, gradeCol: String,
      k: Int): DataFrame = {
    def gain(g: org.apache.spark.sql.Column) = pow(lit(2.0), g) - 1.0
    def disc(r: org.apache.spark.sql.Column) =
      log(r.cast("double") + 1.0) / log(lit(2.0))
    val byRank = Window.orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val real = run.where(col(rankCol) <= k)
      .select(col(idCol), col(rankCol).cast("long").as("rank"))
      .join(grades.select(col(idCol),
        col(gradeCol).cast("double").as("g")), Seq(idCol), "left")
      .withColumn("grade", coalesce(col("g"), lit(0.0)))
      .withColumn("dcg", sum(gain(col("grade")) / disc(col("rank"))).over(byRank))
    val ideal = grades
      .select(col(gradeCol).cast("double").as("ig"), col(idCol).as("iid"))
      .orderBy(col("ig").desc, col("iid"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("ig").desc, col("iid")))
          .cast("long"))
      .withColumn("idcg", sum(gain(col("ig")) / disc(col("rank"))).over(byRank))
      .select(col("rank"), col("idcg"))
    real.join(ideal, Seq("rank"), "left")
      .select(col("rank"), col(idCol),
        col("grade").cast("long").as("grade"),
        round(col("dcg") + lit(1e-9), 6).as("dcg"),
        round(col("idcg") + lit(1e-9), 6).as("idcg"),
        round(col("dcg") / nullif(col("idcg"), lit(0.0)) + lit(1e-9), 6)
          .as("ndcg"))
  }
}
