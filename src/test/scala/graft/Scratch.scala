package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway local profiling main (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-24s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()

    import graft.operators.Dedup
    val docs = Tables.documents(spark, d)
    time("docs")(docs.count())
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.count())
    val shc = sh.cache()
    time("shingles_cache")(shc.count())
    val sigs = Dedup.minhashSignatures(shc, "doc_id", 32)
    time("signatures")(sigs.count())
    val cand = Dedup.lshCandidates(sigs, "doc_id", 32, 4, 100)
    time("candidates")(cand.count())
    time("jaccard")(Dedup.jaccardVerify(cand, shc, "doc_id", 0.5).count())
    time("full_minhash")(Dedup.minhashLsh(docs, "doc_id", "text").count())
    time("embcos")(Dedup.embeddingNearDup(
      Tables.embeddings(spark, d), "vec_id", "embedding",
      graft.functions.VectorFns.signCode(col("embedding"), 6), 0.4).count())

    import graft.operators.Bm25
    import graft.functions.TextFns
    val terms = graft.queries.VectorQueries.QueryTerms
    val toks = docs.select(col("doc_id"),
      explode(TextFns.bm25Tokens(col("text"))).as("term"))
    time("bm25_tokens")(toks.count())
    time("bm25_score")(Bm25.score(docs, "doc_id", "text", terms).count())
    time("bm25_topk")(Bm25.topK(docs, "doc_id", "text", terms, 20).count())
    time("bm25_topk2")(Bm25.topK(docs, "doc_id", "text", terms, 20).count())
    spark.catalog.clearCache()
    time("bm25_topk_cksum") {
      val df = Bm25.topK(docs, "doc_id", "text", terms, 20)
      df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).collect()
      20L
    }
    val ck = Bm25.topK(docs, "doc_id", "text", terms, 20)
    println("CKSUM_PLAN " + ck
      .agg(sum(xxhash64(ck.columns.map(col): _*).cast("decimal(38,0)")))
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("TakeOrdered") || l.contains("Sort ") || l.contains("GlobalLimit"))
      .mkString(" | "))
    spark.stop()
  }
}
