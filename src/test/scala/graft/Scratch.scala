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

    import graft.operators.Dedup

    // pair-budget certificates: Σ_sh C(df,2) for the flat (df-capped)
    // and prefix posting frames, per scale factor
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/repo/.scaleprobe/sf1")) {
      if (new java.io.File(d + "/documents.parquet").exists()) {
        val docs = Tables.documents(spark, d)
        val sh = Dedup.shingles(docs, "doc_id", "text", 3).cache()
        val dfs = sh.groupBy(col("sh")).agg(count(lit(1)).as("df")).cache()
        // the operator's own certificate over the df-capped postings
        val flat = Dedup.pairCertificate(
          sh.join(dfs.where(col("df") <= 200).select(col("sh")), Seq("sh")),
          "sh")
        // prefix postings: rebuild the same frame ngramJaccardPrefix uses
        val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
        val sorted = sh.join(dfs, Seq("sh"))
          .groupBy(col("doc_id"))
          .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ks"))
          .select(col("doc_id"), col("ks"), size(col("ks")).as("nsh"),
            (size(col("ks")) - ceil(lit(0.6) * size(col("ks"))) + 1)
              .cast("int").as("plen"))
        val prefix = sorted
          .select(col("doc_id"),
            posexplode(slice(col("ks"), lit(1), col("plen")))
              .as(Seq("pos0", "k")))
          .select(col("doc_id"), col("k.sh").as("sh"))
        val pfx = Dedup.pairCertificate(prefix, "sh")
        println(s"CERT $d flat=$flat prefix=$pfx")
        spark.catalog.clearCache()
      } else println(s"CERT $d MISSING")
    }
    spark.stop()
  }
}
