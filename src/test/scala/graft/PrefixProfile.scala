package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Test-scope profiler for the prefix-filtered ngram pipeline (the
  * internals are prune-heavy and change; this times the operator
  * end-to-end the way Bench does, cold per run).
  */
object PrefixProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    (1 to 3).foreach { run =>
      val t0 = System.nanoTime()
      val df = Dedup.ngramJaccardPrefix(
        Tables.documents(spark, sfDir), "doc_id", "text", 3, 0.6)
      df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
        .collect()
      println(f"RUN $run cold: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
