package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Precision search: lexical candidate retrieval + per-field match
  * diagnostics + fused scoring — the Spark-native re-expression of
  * the reference's precision engine
  * (reference: backend/app/core/precision_search.py:89 PrecisionSearch
  * — BM25 candidates, _analyze_match field diagnostics,
  * _calculate_final_score fusion, min_disease_score filter).
  *
  * Scale design: the BM25 stage prunes to `candidates` rows (top-k via
  * TakeOrderedAndProject), which are then BROADCAST back against the
  * corpus for the diagnostic columns — the big side is scanned once
  * with a broadcast hash join, and all diagnostics are narrow
  * codegen'd projections.
  */
object Precision {

  /** @param titleLen    leading characters treated as the "title"
    *                    field (the reference reads a separate title
    *                    column; our documents are single-text)
    * @param candidates  BM25 candidate pool size (reference fetches
    *                    top_k * 5 for filtering)
    * @param minRelevance drop candidates whose query-term coverage is
    *                    below this (min_disease_score analog)
    */
  def search(
      docs: DataFrame, idCol: String, textCol: String,
      rawTerms: Seq[String], titleLen: Int, candidates: Int,
      minRelevance: Double, k: Int): DataFrame = {
    // lowercase like Bm25.score does — the diagnostics below match
    // against lowercased text, so an uppercase term would zero out
    // relevance for candidates BM25 itself had matched
    val terms = rawTerms.map(TextFns.lcRoot).distinct
    require(terms.nonEmpty, "precision search needs at least one term")
    val cand = Bm25.topK(docs, idCol, textCol, terms, candidates)
    def hits(c: Column): Column =
      terms.map(t => when(c.contains(t), 1).otherwise(0)).reduce(_ + _)
    docs.select(col(idCol), lower(col(textCol)).as("lt"))
      .join(broadcast(cand), Seq(idCol))
      .withColumn("terms_matched", hits(col("lt")))
      .withColumn("title_hits", hits(substring(col("lt"), 1, titleLen)))
      .withColumn("match_field",
        when(col("title_hits") > 0, "title").otherwise("full_text"))
      .withColumn("relevance",
        round(col("terms_matched") / lit(terms.size.toDouble), 6))
      .where(col("relevance") >= minRelevance)
      .withColumn("final_score", round(
        col("bm25") * (lit(0.4) + lit(0.6) * col("relevance")) *
          when(col("match_field") === "title", 1.2).otherwise(1.0), 6))
      .orderBy(col("final_score").desc, col(idCol))
      .limit(k)
      .select(col(idCol),
        col("terms_matched").cast("long").as("terms_matched"),
        col("title_hits").cast("long").as("title_hits"),
        col("match_field"), col("relevance"), col("final_score"))
  }
}
