package graft

import org.apache.spark.sql.functions._

/** Test-scope scale probe for Stats.centrality at the panel CONTRACT
  * bound (maxFeatures = 1000 nodes, ~5% edge density → ~25k edges):
  * the demo binding's 40-gene graph exercises correctness; this
  * exercises the claimed bound, separating graph construction from
  * the 8-round power iteration. Usage:
  *   sbt "Test/runMain graft.CentralityProfile [nNodes [density]]"
  */
object CentralityProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val density = if (args.length > 1) args(1).toDouble else 0.05
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[centrality] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // deterministic pseudo-random graph: md5-bucketed pair selection
    // (no Math.random — reproducible run to run)
    val edges = spark.range(n.toLong * n)
      .select((col("id") / n).cast("long").as("i"),
        pmod(col("id"), lit(n.toLong)).as("j"))
      .where(col("i") < col("j"))
      .where(pmod(crc32(concat_ws("_", col("i"), col("j"))), lit(10000L))
        < lit((density * 10000).toLong))
      .select(concat(lit("g"), col("i")).as("ga"),
        concat(lit("g"), col("j")).as("gb"),
        (pmod(crc32(concat_ws("x", col("i"), col("j"))), lit(60L))
          .cast("double") / 100.0 + 0.4).as("abs_corr"))
    val nEdges = timed("edge generation")(edges.count())
    println(s"[centrality] $n nodes, $nEdges edges")
    val out = timed("degree + 8-round power iteration + rollup") {
      graft.operators.Stats.centrality(edges, iters = 8).collect()
    }
    println(s"[centrality] ${out.length} nodes ranked; " +
      s"top: ${out.take(3).map(_.getString(0)).mkString(", ")}")
    spark.stop()
  }
}
