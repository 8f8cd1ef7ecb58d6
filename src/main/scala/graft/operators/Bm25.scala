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
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFns.bm25Tokens(col(textCol))).as("term"))

    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).cast("double").as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))

    val qToks = toks.where(col("term").isInCollection(queryTerms))
    val tf = qToks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = qToks.select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))

    val idf = log(
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val tfNorm = col("tf") * (K1 + 1.0) /
      (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))

    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("term_score", idf * tfNorm)
      .groupBy(col(idCol))
      .agg(sum(col("term_score")).as("bm25"))
  }

  /** Top-k BM25 search (TakeOrderedAndProject — no full sort). */
  def topK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame =
    score(docs, idCol, textCol, queryTerms)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("bm25"), 6).as("bm25"))
}
