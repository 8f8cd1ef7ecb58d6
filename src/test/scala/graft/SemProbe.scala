package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r12 probe: production-threshold semantic dedup must
  * recover the ScaleUp corpus's PLANTED near-dup structure (10-way
  * replica clusters, 1e-3 component nudge). Not part of the API.
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    val emb = Tables.embeddings(spark, "/root/repo/.scaleprobe/sf1")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val t0 = System.nanoTime()
    val dropped = Dedup.semanticDedup(emb, "vec_id", "embedding",
      k = 64, iters = 2, minCos = 0.999, maxCell = 2000).cache()
    val nd = dropped.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // planted truth: each source vector has 9 replicas; a perfect
    // blocking would drop 9/10 of the corpus
    val bySim = dropped.agg(
      coalesce(min(col("dup_sim")), lit(-1.0)).as("min_sim"),
      coalesce(avg(col("dup_sim")), lit(-1.0)).as("avg_sim")).head()
    println(f"SEMPROBE n=$n dropped=$nd frac=${nd.toDouble / n}%.4f " +
      f"min_sim=${bySim.getDouble(0)}%.6f avg_sim=${bySim.getDouble(1)}%.6f " +
      f"wall=${secs}%.1f s")
  }
}
