package graft

/** Test-scope stage profiler for dedup_cluster (like MinhashProfile):
  * separates pair-generation cost from the propagation loop so a
  * regression points at a phase, not a query. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt "Test/runMain graft.ClusterProfile"
  */
object ClusterProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cluster] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val pairs = graft.operators.Dedup.minhashLsh(
      Tables.documents(spark, sfDir), "doc_id", "text",
      shingleN = 3, numHashes = 32, bandRows = 4,
      minJaccard = 0.5, maxBucket = 100)
    timed("pairs only")(pairs.count())
    spark.catalog.clearCache()
    val out = timed("seed + converge (includes pair recompute)") {
      graft.operators.Dedup.connectedComponents(pairs, "da", "db")
    }
    timed("terminal action")(out.collect().length)
    spark.stop()
  }
}
