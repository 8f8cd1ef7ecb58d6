package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Batch embedding generation — the Spark-native re-expression of the
  * reference's first pipeline stage, text → dense vector
  * (reference: backend/app/core/embeddings.py:21
  * PubMedBertEmbedder.embed_texts). The reference embeds with a GPU
  * transformer; the public-knowledge batch equivalent on Spark is
  * feature-hashed TF-IDF (HashingTF/IDF-style, but md5-hashed so the
  * DuckDB oracle can reproduce every bucket exactly) plus MLlib
  * Word2Vec (spec-tested — model weights are not oracle-checkable).
  *
  * Scale design:
  *  - tokens/tf/df are all map-side-combinable aggregations; the only
  *    shuffles are groupBy(id, term) and groupBy(term), both on keys.
  *  - the tf⋈df join keys both sides on `term`, so the df aggregate
  *    reuses tf's exchange (no extra shuffle of the corpus).
  *  - n_docs is a 1-row broadcast.
  *  - output is LONG FORM (id, pos, w): map-side combinable and never
  *    materialises wide arrays in a shuffle; `assemble` densifies at
  *    the end, after the last exchange.
  *
  * Cache lifecycle: the tf frame is cached (two consumers in this
  * plan); like Dedup, the caller owns the session-level lifecycle —
  * Bench/Verify run spark.catalog.clearCache() between queries.
  */
object Embed {

  /** Smoothed IDF weight: ln((n+1)/(df+1)) + 1 — the standard
    * smoothed formulation (always positive, never divides by zero).
    */
  private def idf(nDocs: org.apache.spark.sql.Column, df: org.apache.spark.sql.Column) =
    log((nDocs + lit(1.0)) / (df + lit(1.0))) + lit(1.0)

  /** Hashed TF-IDF in long form: (idCol, pos, w) where
    * pos = md5-hash(term) mod dim and w sums tf·idf over the terms
    * colliding in that bucket (classic feature hashing).
    */
  def hashedTfIdfLong(
      docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFns.bm25Tokens(col(textCol))).as("term"))
    // tf feeds BOTH the df aggregate and the weighting join — cache
    // so the token explode + groupBy(id, term) runs once (same
    // dual-consumer treatment as Bm25.score's perDoc frame)
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
      .cache()
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(dfT, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("pos", pmod(TextFns.hexHash32(col("term")), lit(dim.toLong)))
      .withColumn("w", col("tf") * idf(col("n_docs"), col("df")))
      .groupBy(col(idCol), col("pos"))
      .agg(sum(col("w")).as("w"))
  }

  /** Densify a long-form (idCol, pos, w) frame into fixed-`dim`
    * double arrays (missing buckets → 0.0). Runs AFTER the last
    * aggregation, so wide arrays never enter an exchange.
    */
  def assemble(longForm: DataFrame, idCol: String, dim: Int): DataFrame =
    longForm.groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("pos"), col("w")))).as("m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("m"), i), lit(0.0))).as("tfidf"))

  /** Full pipeline: documents → dense hashed-TF-IDF vectors.
    * SPARSE contract: a document whose text tokenizes to nothing
    * (all tokens length <= 2) has no long-form rows and therefore NO
    * output vector — not a zero vector. Callers that need the full
    * doc universe (e.g. before an inner join on doc_id) left-join the
    * source frame; both engines share the omission, so the oracle
    * comparison is unaffected.
    */
  def hashedTfIdf(
      docs: DataFrame, idCol: String, textCol: String, dim: Int): DataFrame =
    assemble(hashedTfIdfLong(docs, idCol, textCol, dim), idCol, dim)
}
