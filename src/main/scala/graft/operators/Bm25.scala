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
    * term are absent (score would be 0). Empty query → empty frame
    * (not an empty.reduce crash).
    * Output: (idCol, bm25 double — unrounded).
    *
    * Single-pass NARROW plan: query terms are statically known, so
    * per-term tf and doc length are array counts over the token
    * expression in ONE projection — no token explode, no per-doc
    * groupBy, zero shuffle for the per-doc frame (subexpression
    * elimination computes the tokenizer once per row). Corpus stats
    * (N, avgdl, per-term df) are one aggregate over that frame,
    * broadcast back as a single row.
    *
    * Reference parity: N and avgdl are computed over ALL documents,
    * including docs that tokenize to nothing (BM25Okapi's corpus
    * statistics include zero-length docs — deriving stats from an
    * exploded token stream silently dropped them). Query terms are
    * lowercased to match the lowercase token stream, and pivoted
    * columns are aliased by INDEX (a term containing '.' would break
    * a col("tf_<term>") reference).
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      rawQueryTerms: Seq[String],
      termWeights: Map[String, Double] = Map.empty): DataFrame = {
    val queryTerms = rawQueryTerms.map(TextFns.lcRoot).distinct
    val weights = termWeights.map { case (t, w) => TextFns.lcRoot(t) -> w }
    if (queryTerms.isEmpty)
      return docs.select(col(idCol), lit(0.0).as("bm25")).limit(0)
    val idx = queryTerms.indices

    def tfCol(i: Int) = s"tf_$i"
    def dfCol(i: Int) = s"df_$i"

    // per-doc frame feeds BOTH the corpus-stats aggregate and the
    // final scoring join — cache so the tokenizer runs once (one
    // narrow row per doc; caller owns cache lifecycle, see Dedup's
    // scaladoc note)
    val tokens = TextFns.bm25Tokens(col(textCol))
    val perDoc = docs.select(
      col(idCol) +:
        size(tokens).cast("double").as("dl") +:
        idx.map(i =>
          size(filter(tokens, t => t === queryTerms(i))).cast("double")
            .as(tfCol(i))): _*)
      .cache()

    val stats = perDoc.agg(
      count(lit(1)).cast("double").as("n_docs"),
      (avg(col("dl")).as("avgdl") +:
        idx.map(i =>
          sum(when(col(tfCol(i)) > 0, 1).otherwise(0)).cast("double")
            .as(dfCol(i)))): _*)

    def idf(i: Int) = log(
      (col("n_docs") - col(dfCol(i)) + 0.5) / (col(dfCol(i)) + 0.5) + 1.0)
    def tfNorm(i: Int) = col(tfCol(i)) * (K1 + 1.0) /
      (col(tfCol(i)) +
        lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))

    perDoc
      .where(idx.map(i => col(tfCol(i))).reduce(_ + _) > 0)
      .crossJoin(broadcast(stats))
      .withColumn("bm25",
        idx.map(i =>
          idf(i) * tfNorm(i) * lit(weights.getOrElse(queryTerms(i), 1.0)))
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
    // primary-weight precedence AFTER lowercasing (score() lowercases
    // too, so "Spark" as primary and "spark" as expansion are the
    // same term and must keep full weight)
    val prim = primary.map(TextFns.lcRoot).distinct
    val exp = expansions.map(TextFns.lcRoot).distinct.filterNot(prim.contains)
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
