package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distributed BM25 scoring — Spark-native re-expression of the
  * reference's sparse retrieval path
  * (reference: backend/app/core/embeddings.py:162 BM25Index,
  * :234 search — BM25Okapi with k1=1.5, b=0.75, and the
  * `idf = ln((N - df + 0.5)/(df + 0.5) + 1)` Okapi formula).
  *
  * Scale design: corpus statistics (N, avgdl, per-term df for the
  * query terms only) are tiny aggregates that get broadcast; the term
  * filter is applied BEFORE the tf shuffle so only rows matching query
  * terms ever move; doc length is one map-side-combinable count.
  */
object Bm25 {
  val K1 = 1.5
  val B = 0.75

  /** Per-doc BM25 score against `queryTerms`; docs with no matching
    * term are absent (score would be 0).
    * Output: (idCol, bm25 double — unrounded).
    *
    * Single-pass wide plan: one token explode feeds ONE groupBy that
    * computes doc length AND per-query-term tf columns together
    * (query terms are statically known, so tf pivots into columns);
    * corpus stats (N, avgdl, per-term df) are a second aggregate over
    * the already-tiny per-doc frame, broadcast back as one row. The
    * corpus is scanned once; the only wide shuffle carries one row per
    * doc with |queryTerms| + 1 numeric columns.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      rawQueryTerms: Seq[String],
      termWeights: Map[String, Double] = Map.empty): DataFrame = {
    // dedupe HERE, where the pivoted tf_<term> columns are built — a
    // repeated term would create ambiguous column references for
    // every caller, not just the expansion path
    val queryTerms = rawQueryTerms.distinct
    val toks = docs.select(col(idCol),
      explode(TextFns.bm25Tokens(col(textCol))).as("term"))

    def tfCol(t: String) = s"tf_${t}"
    def dfCol(t: String) = s"df_${t}"

    // per-doc frame feeds BOTH the corpus-stats aggregate and the
    // final scoring join — cache so the token explode + groupBy runs
    // once (one narrow row per doc; caller owns cache lifecycle, see
    // Dedup's scaladoc note)
    val perDoc = toks.groupBy(col(idCol)).agg(
      count(lit(1)).cast("double").as("dl"),
      queryTerms.map(t =>
        sum(when(col("term") === t, 1).otherwise(0)).cast("double")
          .as(tfCol(t))): _*)
      .cache()

    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (avg(col("dl")).as("avgdl") +:
        queryTerms.map(t =>
          sum(when(col(tfCol(t)) > 0, 1).otherwise(0)).cast("double")
            .as(dfCol(t)))): _*)

    def idf(t: String) = log(
      (col("n_docs") - col(dfCol(t)) + 0.5) / (col(dfCol(t)) + 0.5) + 1.0)
    def tfNorm(t: String) = col(tfCol(t)) * (K1 + 1.0) /
      (col(tfCol(t)) +
        lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))

    perDoc
      .where(queryTerms.map(t => col(tfCol(t))).reduce(_ + _) > 0)
      .crossJoin(broadcast(stats))
      .withColumn("bm25",
        queryTerms.map(t =>
          idf(t) * tfNorm(t) * lit(termWeights.getOrElse(t, 1.0)))
          .reduce(_ + _))
      .select(col(idCol), col("bm25"))
  }

  /** Synonym/abbreviation-expanded top-k: primary terms at full
    * weight, expansion terms down-weighted — the reference's
    * vocabulary expansion (build_search_query adds primary_terms +
    * synonyms + abbreviations to the lexical query,
    * reference: backend/app/core/precision_search.py:165). Single
    * pass — expanded terms just widen the pivoted tf columns.
    */
  def topKExpanded(
      docs: DataFrame, idCol: String, textCol: String,
      primary: Seq[String], expansions: Seq[String], expansionWeight: Double,
      k: Int): DataFrame = {
    // synonym lists routinely repeat the primary term — dedupe with
    // primary-weight precedence (duplicate terms would otherwise
    // build ambiguous tf_<term> columns)
    val prim = primary.distinct
    val exp = expansions.distinct.filterNot(prim.contains)
    score(docs, idCol, textCol, prim ++ exp,
      exp.map(_ -> expansionWeight).toMap)
      .withColumn("bm25", round(col("bm25"), 6))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("bm25"))
  }

  /** Top-k BM25 search (TakeOrderedAndProject — no full sort).
    * Ranks on the ROUNDED score (6dp) with id tiebreak so the row set
    * at the LIMIT boundary is identical to the oracle's, which orders
    * by round(s, 6) — ranking on raw doubles could disagree when two
    * scores round equal.
    */
  def topK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame =
    score(docs, idCol, textCol, queryTerms)
      .withColumn("bm25", round(col("bm25"), 6))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("bm25"))
}
