package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunker, Dedup, Embed, VectorSearch}

/** End-to-end integration of the reference's corpus flow on graft
  * operators alone: documents → dedup → chunk → embed → search
  * (reference: corpus_builder.build_collection → text_splitter →
  * embeddings.embed_texts → vector_store search). Every stage is a
  * pure DataFrame transform, so the whole pipeline is one lazy plan.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark shuffles data across the cluster for wide joins and aggregations at scale"),
    (1L, "spark shuffles data across the cluster for wide joins and aggregations at scale"),
    (2L, "window functions rank rows within user partitions ordered by event time columns"),
    (3L, "text chunking splits long documents into overlapping character windows with indexes")
  ).toDF("doc_id", "text")

  test("dedup -> chunk -> embed -> search composes as one flow") {
    // 1. drop exact duplicates (keep canonical ids)
    val dupIds = Dedup.exact(docs, "doc_id", "text")
      .select(col("canonical_id")).as[Long].collect().toSet
    val dupes = Dedup.exact(docs, "doc_id", "text")
    val keep = docs.join(
      dupes.select(explode(array(col("canonical_id"))).as("doc_id"))
        .withColumn("is_canon", lit(true)),
      Seq("doc_id"), "left")
      .join(docs.groupBy(md5(col("text")).as("h")).count().where(col("count") > 1)
        .select(col("h")), md5(col("text")) === col("h"), "left")
      .where(col("h").isNull || col("is_canon"))
      .select(col("doc_id"), col("text"))
    assert(keep.count() == 3)          // doc 1 dropped, doc 0 kept
    assert(dupIds == Set(0L))

    // 2. chunk into overlapping windows
    val chunks = Chunker.fixedChunks(keep, "doc_id", "text", 40, 10)
      .withColumn("chunk_id",
        col("doc_id") * 1000 + col("chunk_index"))
    assert(chunks.count() > keep.count()) // docs produced multiple chunks

    // 3. embed every chunk (hashed TF-IDF, 32 dims)
    val vecs = Embed.hashedTfIdf(chunks, "chunk_id", "chunk_text", 32)
    assert(vecs.count() == chunks.count())

    // 4. search: top-3 chunks for doc 0's first chunk vector
    val q = vecs.where(col("chunk_id") === 0L).select(col("tfidf").as("qe"))
    val hits = VectorSearch.denseTopK(
      vecs.where(col("chunk_id") =!= 0L), q, "chunk_id", "tfidf", "qe", 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.length == 3)
    // ranked by rounded cosine, scores valid and non-increasing
    assert(hits.map(_._2).sliding(2).forall(p => p.head >= p.last))
    assert(hits.forall(h => h._2 >= -1.0 && h._2 <= 1.0))
  }
}
