package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Test-scope profiler for the prefix-filtered ngram pipeline (the
  * internals are prune-heavy and change; this times the operator
  * end-to-end the way Bench does, cold per run, plus a stage
  * breakdown replaying the operator's internal frames).
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

    // stage breakdown: replay the internal frames (same shapes as
    // the operator, timed separately on a cold cache)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-18s rows=$n%-10d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = Tables.documents(spark, sfDir)
    val minJ = 0.6
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).cache()
    time("shingles")(sh.count())
    val dfs = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val sorted = sh.join(dfs, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ks"))
      .select(col("doc_id"), col("ks"), size(col("ks")).as("nsh"),
        (size(col("ks")) -
          ceil(lit(minJ) * size(col("ks"))) + 1).cast("int").as("plen"))
      .cache()
    time("sorted_fill")(sorted.count())
    val prefix = sorted
      .select(col("doc_id"), col("nsh"),
        posexplode(slice(col("ks"), lit(1), col("plen"))).as(Seq("pos0", "k")))
      .select(col("doc_id"), col("nsh"),
        (col("pos0") + 1).as("pos"), col("k.sh").as("sh"))
    time("prefix_cert") {
      Dedup.pairCertificate(prefix, "sh"); 1L
    }
    val a = prefix.select(col("doc_id").as("da"), col("sh"),
      col("nsh").as("na"), col("pos").as("pa"))
    val b = prefix.select(col("doc_id").as("db"), col("sh"),
      col("nsh").as("nb"), col("pos").as("pb"))
    val minOverlap = ceil(
      (lit(minJ) / (lit(1.0) + lit(minJ))) * (col("na") + col("nb")) -
        lit(1e-9))
    val cand = a.join(b, Seq("sh"))
      .where(col("da") < col("db"))
      .groupBy(col("da"), col("db"))
      .agg(min(col("pa")).as("ia"), min(col("pb")).as("jb"),
        max(col("na")).as("na"), max(col("nb")).as("nb"))
      .where(col("na") >= lit(minJ) * col("nb") - lit(1e-9) &&
        col("nb") >= lit(minJ) * col("na") - lit(1e-9))
      .where(least(col("na") - col("ia") + 1, col("nb") - col("jb") + 1) >=
        minOverlap)
      .select(col("da"), col("db"))
      .cache()
    time("candidates")(cand.count())
    val arrs = sorted.select(col("doc_id"),
      transform(col("ks"), x => x.getField("sh")).as("shs"), col("nsh"))
    time("array_verify") {
      cand
        .join(arrs.select(col("doc_id").as("da"), col("shs").as("sa"),
          col("nsh").as("na")), Seq("da"))
        .join(arrs.select(col("doc_id").as("db"), col("shs").as("sb"),
          col("nsh").as("nb")), Seq("db"))
        .withColumn("common",
          size(array_intersect(col("sa"), col("sb"))).cast("double"))
        .withColumn("raw_jac",
          col("common") / (col("na") + col("nb") - col("common")))
        .where(col("raw_jac") >= minJ)
        .count()
    }
    spark.stop()
  }
}
