package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Research-output validation — the Spark-native re-expression of the
  * reference's summary validator (reference:
  * backend/app/utils/validator.py:102 validate_summary; word-coverage
  * at :391 _calculate_coverage; cosine at :382). The LLM/RAG serving
  * parts (vector_store round-trips, embed_text calls) are I/O; what
  * ships is the scoring: per paper, the summary embedding's average
  * and max cosine against the paper's chunk embeddings, the fraction
  * of the original's significant words the summary covers, and the
  * reference's weighted score rollup —
  *   similarity = avg·100, coverage = frac·100,
  *   consistency = (max·0.6 + avg·0.4)·100,
  *   overall = sim·0.4 + cov·0.3 + cons·0.3.
  *
  * Scale: the similarity leg is a per-paper join (summaries × chunks
  * co-partition on the paper key — one shuffle, no cross-paper
  * fan-out); the coverage leg is two distinct-token aggregates and a
  * (paper, word) join, all map-side combinable. Batch-validating a
  * million summaries is the same plan.
  *
  * Cross-engine: cosines round to 6dp (the vs_* protocol), averages
  * and scores round 6dp with the +1e-9 nudge.
  */
object Validate {

  /** The coverage stopword set (validator.py:396). */
  val coverageStopwords: Seq[String] = Seq(
    "this", "that", "with", "from", "have", "been", "were", "which",
    "their", "more")

  private def r6(c: org.apache.spark.sql.Column) =
    round(c + lit(1e-9), 6)

  /** `chunks`: (paper, vec) one row per original chunk;
    * `summaries`: (paper, vec) one row per paper;
    * `chunkTexts` / `summaryTexts`: (paper, text) — chunk texts may
    * span multiple rows per paper (the reference joins them, but set
    * union of tokens is equivalent and never materializes the
    * concatenation).
    */
  def summaryValidate(
      chunks: DataFrame, summaries: DataFrame, chunkTexts: DataFrame,
      summaryTexts: DataFrame, paperCol: String, vecCol: String,
      textCol: String): DataFrame = {
    // similarity leg
    val s = summaries.select(col(paperCol), col(vecCol).as("_sv"))
      .withColumn("_snrm", VectorFns.l2Norm(col("_sv")))
    val sims = chunks.select(col(paperCol), col(vecCol).as("_cv"))
      .withColumn("_cnrm", VectorFns.l2Norm(col("_cv")))
      .join(s, Seq(paperCol))
      .withColumn("_cos", round(VectorFns.cosinePrenormed(
        col("_cv"), col("_sv"), col("_cnrm"), col("_snrm")), 6))
      .groupBy(col(paperCol))
      .agg(r6(avg(col("_cos"))).as("avg_sim"),
        max(col("_cos")).as("max_sim"))
    // coverage leg: distinct significant words each side
    def words(df: DataFrame) = df
      .select(col(paperCol), explode(regexp_extract_all(
        lower(col(textCol)), lit("[a-z]{4,}"), lit(0))).as("_w"))
      .where(!col("_w").isInCollection(coverageStopwords))
      .distinct()
    val orig = words(chunkTexts)
    val nOrig = orig.groupBy(col(paperCol))
      .agg(count(lit(1)).cast("double").as("_no"))
    val overlap = orig.join(words(summaryTexts), Seq(paperCol, "_w"))
      .groupBy(col(paperCol))
      .agg(count(lit(1)).cast("double").as("_ov"))
    val cov = nOrig.join(overlap, Seq(paperCol), "left")
      .select(col(paperCol),
        (coalesce(col("_ov"), lit(0.0)) / col("_no")).as("_cov"))
    sims.join(cov, Seq(paperCol))
      .withColumn("similarity_score", r6(col("avg_sim") * 100.0))
      .withColumn("coverage_score", r6(col("_cov") * 100.0))
      .withColumn("consistency_score",
        r6((col("max_sim") * 0.6 + col("avg_sim") * 0.4) * 100.0))
      .withColumn("overall_confidence",
        r6(col("similarity_score") * 0.4 + col("coverage_score") * 0.3 +
          col("consistency_score") * 0.3))
      .select(col(paperCol), col("similarity_score"),
        col("coverage_score"), col("consistency_score"),
        col("overall_confidence"))
  }

  /** Claim validation against the indexed corpus (validator.py:167
    * validate_claim): top-k chunks per claim by cosine (the serving
    * search path, here the bounded map-side knnJoin), then the
    * reference's heuristics — sim > supportThr counts supporting,
    * sim < conflictThr counts potentially conflicting, coverage =
    * unique papers hit / max(corpus_chunks / paperNorm, 1) capped at
    * 100, consistency = supporting / results·100, overall =
    * sim·0.4 + cov·0.3 + cons·0.3.
    *
    * Scale: claims batch through ONE knnJoin (partial top-k before
    * the exchange); everything after runs on claims × k rows.
    */
  def claimValidate(
      chunks: DataFrame, claims: DataFrame, chunkId: String,
      chunkVec: String, paperCol: String, claimId: String,
      claimVec: String, topK: Int = 10, supportThr: Double = 0.6,
      conflictThr: Double = 0.3, paperNorm: Int = 50): DataFrame = {
    val n = chunks.agg(count(lit(1)).cast("double").as("_nchunks"))
    val hits = VectorSearch.knnJoin(chunks, claims, chunkId, chunkVec,
      claimId, claimVec, topK)
      .join(chunks.select(col(chunkId), col(paperCol)), Seq(chunkId))
    hits.groupBy(col(claimId))
      .agg(
        count(lit(1)).cast("double").as("_nres"),
        sum(when(col("cos_sim") > supportThr, 1L).otherwise(0L))
          .as("n_supporting"),
        sum(when(col("cos_sim") < conflictThr, 1L).otherwise(0L))
          .as("n_conflicting"),
        countDistinct(col(paperCol)).as("n_unique_papers"),
        r6(avg(col("cos_sim"))).as("_avg"),
        max(col("cos_sim")).as("_max"))
      .crossJoin(broadcast(n))
      .withColumn("similarity_score", r6(col("_avg") * 100.0))
      .withColumn("coverage_score", r6(least(lit(100.0),
        col("n_unique_papers").cast("double") /
          greatest(col("_nchunks") / paperNorm.toDouble, lit(1.0)) *
          100.0)))
      .withColumn("consistency_score",
        r6(col("n_supporting").cast("double") / col("_nres") * 100.0))
      .withColumn("overall_confidence",
        r6(col("similarity_score") * 0.4 + col("coverage_score") * 0.3 +
          col("consistency_score") * 0.3))
      .select(col(claimId), col("n_supporting"), col("n_conflicting"),
        col("n_unique_papers"), col("similarity_score"),
        col("coverage_score"), col("consistency_score"),
        col("overall_confidence"))
  }

  /** Cross-validation of papers against each other
    * (validator.py:321 cross_validate_papers): each paper's
    * representative vector searches the corpus top-k, self-chunks
    * drop out, and the survivors score the paper — overall =
    * sum of the first topAvg sims / topAvg·100 (a FIXED divisor,
    * even when fewer survive — the reference's sum(x[:5])/5),
    * similarity = max·100, coverage = papers with sim > supportThr /
    * n_papers·100, consistency = avg·100.
    *
    * DEVIATION (documented): papers whose every hit is self (no
    * cross references) are omitted rather than emitted with null
    * scores. Post-self-filter order follows the knnJoin rank
    * (cos desc, chunk id) — the reference's ranked search order.
    */
  def crossValidate(
      chunks: DataFrame, reps: DataFrame, chunkId: String,
      chunkVec: String, paperCol: String, repPaper: String,
      repVec: String, topK: Int = 20, supportThr: Double = 0.5,
      topAvg: Int = 5): DataFrame = {
    val nPapers = reps
      .agg(count(lit(1)).cast("double").as("_npapers"))
    // strip the chunk paper column before the knn cross join — the
    // query side's repPaper may share its name
    val hits = VectorSearch.knnJoin(
      chunks.select(col(chunkId), col(chunkVec)), reps, chunkId,
      chunkVec, repPaper, repVec, topK)
      .join(chunks.select(col(chunkId),
        col(paperCol).as("_hitpaper")), Seq(chunkId))
      .where(col("_hitpaper") =!= col(repPaper))
      .withColumn("_r2", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(repPaper)).orderBy(col("rnk"))))
    hits.groupBy(col(repPaper))
      .agg(
        sum(when(col("_r2") <= topAvg, col("cos_sim"))
          .otherwise(0.0)).as("_stop"),
        max(col("cos_sim")).as("_max"),
        r6(avg(col("cos_sim"))).as("_avg"),
        countDistinct(when(col("cos_sim") > supportThr,
          col("_hitpaper"))).as("_nsup"))
      .crossJoin(broadcast(nPapers))
      .withColumn("overall_confidence",
        r6(col("_stop") / topAvg.toDouble * 100.0))
      .withColumn("similarity_score", r6(col("_max") * 100.0))
      .withColumn("coverage_score", r6(col("_nsup").cast("double") /
        col("_npapers") * 100.0))
      .withColumn("consistency_score", r6(col("_avg") * 100.0))
      .select(col(repPaper), col("similarity_score"),
        col("coverage_score"), col("consistency_score"),
        col("overall_confidence"))
  }
}
