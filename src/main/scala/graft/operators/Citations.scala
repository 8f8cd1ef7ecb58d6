package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Citation analytics — re-expression of the reference's citations
  * route (reference: backend/app/api/routes/citations.py:287
  * calculate_landmark_score — citation-velocity ladder + influential
  * / cross-field / age bonuses capped at 100; :333
  * get_landmark_reasons — ordered reason list capped at 4; :609
  * get_citation_trends — citing-paper years histogrammed per target
  * with a peak year). The reference reads citation counts from the
  * Semantic Scholar HTTP API; the bindings synthesize them
  * deterministically from doc_id so both engines derive identical
  * inputs.
  *
  * Scale shape: landmark scoring is a pure per-row projection
  * (codegen, no shuffle). Trend histograms are one groupBy on
  * (target, year) with map-side combine, then a per-target window
  * for the peak — partitioned by the target key, never a global
  * window.
  */
object Citations {

  /** Velocity-ladder landmark score (citations.py:287), 1dp-rounded
    * for the cross-engine protocol (the reference publishes the raw
    * float).
    */
  def landmarkScore(
      year: Column, citations: Column, influential: Column,
      nFields: Column, currentYear: Int): Column = {
    val age = greatest(lit(1), lit(currentYear) - year)
    val cpy = citations.cast("double") / age
    val base = when(cpy >= 500, 100.0).when(cpy >= 200, 80.0)
      .when(cpy >= 100, 60.0).when(cpy >= 50, 40.0)
      .otherwise(least(lit(40.0), cpy * 0.8))
    val influentialBonus =
      influential.cast("double") / greatest(lit(1), citations) * 20.0
    val fieldBonus = least(lit(10.0), nFields.cast("double") * 2.0)
    val ageBonus = when(age >= 10 && citations >= 1000, 10.0)
      .when(age >= 5 && citations >= 500, 5.0).otherwise(0.0)
    round(least(lit(100.0),
      base + influentialBonus + fieldBonus + ageBonus) + lit(1e-9), 1)
  }

  /** Ordered landmark reasons, first 4 kept (citations.py:333); the
    * empty case falls back to 'significant_contribution'. Reason
    * text is tag-ified (the reference interpolates counts into
    * English sentences; the tags keep the selection + order + cap
    * semantics, which is the analytic part).
    */
  def landmarkReasons(
      year: Column, citations: Column, influential: Column,
      nFields: Column, openAccess: Column, currentYear: Int): Column = {
    val age = greatest(lit(1), lit(currentYear) - year)
    val cpy = citations.cast("double") / age
    val candidates = array(
      when(citations >= 10000, "exceptional_citations")
        .when(citations >= 1000, "highly_cited"),
      when(cpy >= 200, "high_velocity"),
      when(influential >= 100, "influential_citations"),
      when(nFields >= 3, "cross_disciplinary"),
      when(age >= 10 && citations >= 1000, "foundational"),
      when(openAccess, "open_access"))
    val kept = slice(filter(candidates, c => c.isNotNull), 1, 4)
    when(size(kept) === 0, "significant_contribution")
      .otherwise(array_join(kept, ";"))
  }

  /** Related-paper ranking (citations.py:644 get_related_papers):
    * candidates tagged cites_this / cited_by_this with relevance =
    * the related paper's citation count, the center excluded,
    * deduplicated keeping the highest-relevance entry, top-N by
    * relevance (the reference's post-sort dedup; paper-id
    * tie-break pinned — Python's stable sort order depends on fetch
    * order).
    */
  def relatedPapers(
      candidates: DataFrame, centerId: Long, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dedup = Window.partitionBy(col("paper_id"))
      .orderBy(col("relevance").desc, col("relation"))
    candidates.where(col("paper_id") =!= centerId)
      .withColumn("rn", row_number().over(dedup))
      .where(col("rn") === 1)
      .orderBy(col("relevance").desc, col("paper_id"))
      .limit(topN)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("relevance").desc, col("paper_id")))
        .cast("long"))
      .select(col("paper_id"), col("relation"), col("relevance"),
        col("rnk"))
  }

  /** Per-target citation-year histogram summary (citations.py:609):
    * total sampled citations, the peak year (max yearly count, ties
    * to the EARLIEST year — the reference's Python max over an
    * unordered dict is nondeterministic; pinned here), its count,
    * and the number of distinct citing years.
    */
  def yearlyTrends(
      edges: DataFrame, targetCol: String, yearCol: String): DataFrame = {
    val yearly = edges.groupBy(col(targetCol), col(yearCol))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(targetCol))
      .orderBy(col("c").desc, col(yearCol))
    yearly
      .withColumn("rn", row_number().over(w))
      .groupBy(col(targetCol))
      .agg(
        sum(col("c")).as("total_sampled"),
        max(when(col("rn") === 1, col(yearCol))).as("peak_year"),
        max(when(col("rn") === 1, col("c"))).as("peak_count"),
        count(lit(1)).as("n_years"))
  }

  /** Composite paper-quality ranking (reference:
    * scripts/paper_citation_ranker.py:184 calculate_quality_score +
    * :271 rank_papers): citation score 0-40 on a piecewise-linear
    * ladder (<=0 -> 0, <10 -> 2/citation, <100 -> 20+0.11/citation,
    * <1000 -> 30+0.011/citation, else 40), recency score 0-30 by age
    * bucket (unknown year -> neutral 15, then 30/27/24/20/15 down to
    * max(5, 15-(age-10))), content score 0-30 (abstract-only 10;
    * fulltext 20 + chunk-richness bonus 3/5/7/10 at >20/>50/>100
    * chunks), ranked by the summed score.
    *
    * Input: one row per unique paper (the reference's
    * get_unique_papers chunk-count aggregation happens upstream).
    * Pure per-row projection + top-N — codegen'd, no shuffle beyond
    * the TakeOrderedAndProject.
    */
  def paperQualityRank(
      papers: DataFrame, currentYear: Int, topN: Int): DataFrame = {
    val c = col("citation_count").cast("double")
    val cs = when(c <= 0, 0.0)
      .when(c < 10, c * 2)
      .when(c < 100, lit(20.0) + (c - 10) * 0.11)
      .when(c < 1000, lit(30.0) + (c - 100) * 0.011)
      .otherwise(40.0)
    val age = (lit(currentYear) - col("year")).cast("double")
    val rs = when(col("year") === 0, 15.0)
      .otherwise(when(age <= 1, 30.0).when(age <= 2, 27.0)
        .when(age <= 3, 24.0).when(age <= 5, 20.0).when(age <= 10, 15.0)
        .otherwise(greatest(lit(5.0), lit(15.0) - (age - 10))))
    val ns = when(not(col("has_fulltext")), 10.0)
      .otherwise(lit(20.0) + when(col("chunk_count") > 100, 10.0)
        .when(col("chunk_count") > 50, 7.0)
        .when(col("chunk_count") > 20, 5.0)
        .otherwise(3.0))
    papers.select(col("doc_id"), col("year"), col("citation_count"),
        col("has_fulltext"), col("chunk_count"),
        round(cs + lit(1e-9), 1).as("citation_score"),
        round(rs + lit(1e-9), 1).as("recency_score"),
        round(ns + lit(1e-9), 1).as("content_score"),
        round(cs + rs + ns + lit(1e-9), 1).as("quality_score"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .limit(topN)
  }
}
