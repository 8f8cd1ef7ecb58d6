package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Embed, VectorSearch}

/** Embedding-generation queries: hashed TF-IDF vectors from raw text
  * (the reference's embed_texts stage re-expressed as deterministic
  * feature hashing so DuckDB can replay every bucket), plus a
  * consumer query that runs dense top-k over the GENERATED vectors —
  * proving the output feeds the existing vector-search surface.
  */
object EmbedQueries {

  private val Dim = 64

  /* ---------------- emb_tfidf ---------------- */

  private def embTfidf(s: SparkSession, d: String): DataFrame =
    Embed.hashedTfIdfLong(Tables.documents(s, d), "doc_id", "text", Dim)
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        round(col("w"), 6).as("w"))
      .orderBy(col("doc_id"), col("pos"))

  private val hexDec = SqlSnippets.hexPrefixDecode("md5(tf.term)")

  private val tfidfCtes =
    s"""tok AS (SELECT doc_id,
       |    unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
       |           t -> length(t) > 2)) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2),
       |nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
       |dfx AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
       |lf AS (SELECT tf.doc_id,
       |    (($hexDec)::BIGINT % $Dim)::BIGINT AS pos,
       |    sum(tf.tf * (ln((nd.n_docs + 1) / (dfx.df + 1)) + 1)) AS w
       |  FROM tf JOIN dfx ON tf.term = dfx.term CROSS JOIN nd
       |  GROUP BY 1, 2)""".stripMargin

  private val embTfidfSql =
    s"""WITH $tfidfCtes
       |SELECT doc_id, pos, round(w, 6) AS w FROM lf
       |ORDER BY doc_id, pos""".stripMargin

  /* ---------------- emb_tfidf_topk ---------------- */

  /** Dense cosine top-10 over the GENERATED vectors (query = doc 0's
    * vector). Both engines score on the 6dp-ROUNDED bucket weights so
    * the two sides share identical inputs. Candidates are restricted
    * to docs sharing >= 1 hashed bucket with the query — the oracle's
    * sparse formulation joins on shared buckets, so a zero-overlap
    * doc (cos exactly 0.0) would exist on the Spark side only and
    * hash-mismatch on data-dependent boundaries.
    */
  private def embTfidfTopk(s: SparkSession, d: String): DataFrame = {
    // lf feeds three consumers (vectors, query buckets, overlap
    // semi-join) — cache the narrow long form once
    val lf = Embed.hashedTfIdfLong(Tables.documents(s, d), "doc_id", "text", Dim)
      .withColumn("w", round(col("w"), 6))
      .cache()
    val vecs = Embed.assemble(lf, "doc_id", Dim)
    val qPos = lf.where(col("doc_id") === 0).select(col("pos"))
    val overlapping = lf.where(col("doc_id") =!= 0)
      .join(broadcast(qPos), Seq("pos"))
      .select(col("doc_id")).distinct()
    val q = vecs.where(col("doc_id") === 0).select(col("tfidf").as("qe"))
    VectorSearch.denseTopK(
      vecs.join(overlapping, Seq("doc_id")), q, "doc_id", "tfidf", "qe", 10)
  }

  private val embTfidfTopkSql =
    s"""WITH $tfidfCtes,
       |tv AS (SELECT doc_id, pos, round(w, 6) AS w FROM lf),
       |q AS (SELECT pos, w FROM tv WHERE doc_id = 0),
       |qn AS (SELECT sum(w * w) AS ns FROM q),
       |n AS (SELECT doc_id, sum(w * w) AS ns FROM tv GROUP BY doc_id),
       |dt AS (SELECT tv.doc_id, sum(tv.w * q.w) AS dot
       |  FROM tv JOIN q ON tv.pos = q.pos WHERE tv.doc_id <> 0 GROUP BY 1)
       |SELECT dt.doc_id,
       |  round(dt.dot / (sqrt(n.ns) * sqrt(qn.ns)), 6) AS cos_sim
       |FROM dt JOIN n ON dt.doc_id = n.doc_id CROSS JOIN qn
       |ORDER BY cos_sim DESC, dt.doc_id LIMIT 10""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("emb_tfidf", embTfidf, Some(embTfidfSql)),
    Qdef("emb_tfidf_topk", embTfidfTopk, Some(embTfidfTopkSql)))
}
