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
}
