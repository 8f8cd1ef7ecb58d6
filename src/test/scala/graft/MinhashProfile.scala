package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Test-scope stage profiler for the minhash LSH pipeline. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 2).foreach { run =>
      println(s"--- run $run ---")
      val docs = Tables.documents(spark, sfDir)
      val sh = Dedup.shingles(docs, "doc_id", "text", 3).cache()
      time("shingles")(sh.count())
      val sigs = Dedup.minhashSignatures(sh, "doc_id", 32)
      time("signatures")(sigs.count())
      val sigsC = sigs.cache()
      sigsC.count()
      val cand = Dedup.lshCandidates(sigsC, "doc_id", 32, 4, 100)
      time("lsh-candidates (sigs cached)")(cand.count())
      val candC = cand.cache(); candC.count()
      time("jaccard-verify (cand+sh cached)")(
        Dedup.jaccardVerify(candC, sh, "doc_id", 0.5).count())
      time("full pipeline cold") {
        spark.catalog.clearCache()
        val df = Dedup.minhashLsh(docs, "doc_id", "text")
        df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)"))).collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
