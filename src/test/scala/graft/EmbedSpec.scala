package graft

import org.apache.spark.sql.functions._

import graft.operators.Embed

class EmbedSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark joins shuffle data across the cluster fast"),
    (1L, "spark joins shuffle data across the cluster fast"),
    (2L, "window functions rank rows within partitions"),
    (3L, "completely unrelated words about cooking pasta tonight")
  ).toDF("doc_id", "text")

  test("hashedTfIdf emits fixed-dim vectors; identical docs get identical vectors") {
    val vecs = Embed.hashedTfIdf(docs, "doc_id", "text", 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(vecs.size == 4)
    assert(vecs.values.forall(_.length == 32))
    assert(vecs(0L) == vecs(1L)) // deterministic: same text, same vector
    assert(vecs(0L) != vecs(2L))
    // every doc has at least one non-zero bucket
    assert(vecs.values.forall(_.exists(_ != 0.0)))
  }

  test("generated vectors feed cosine search: duplicate doc scores 1.0") {
    import graft.functions.VectorFns
    val vecs = Embed.hashedTfIdf(docs, "doc_id", "text", 32)
    val q = vecs.where(col("doc_id") === 0).select(col("tfidf").as("qe"))
    val scored = vecs.where(col("doc_id") =!= 0).crossJoin(q)
      .select(col("doc_id"),
        round(VectorFns.cosine(col("tfidf"), col("qe")), 6).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) == 1.0)          // exact duplicate
    assert(scored(3L) < scored(1L))    // unrelated doc scores lower
  }

  /** Spec-only (declared, like streaming/multimodal): Word2Vec weights
    * are not oracle-checkable, but the Spark-side pipeline — tokens →
    * MLlib Word2Vec → per-doc averaged vectors — is real and runs on
    * the public MLlib API (the reference's transformer embedder analog,
    * reference: backend/app/core/embeddings.py:87 embed_texts).
    */
  test("MLlib Word2Vec trains and emits fixed-dim doc vectors") {
    val tok = docs.select(col("doc_id"),
      split(lower(col("text")), "\\s+").as("tokens"))
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("tokens").setOutputCol("vec")
      .setVectorSize(16).setMinCount(1).setSeed(42L)
      .setNumPartitions(1).setMaxIter(1)
    val model = w2v.fit(tok)
    val out = model.transform(tok).collect()
    assert(out.length == 4)
    out.foreach { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector]("vec")
      assert(v.size == 16)
    }
    assert(model.getVectors.count() > 0)
  }
}
