package graft

import org.apache.spark.sql.functions._

/** Dev harness (r21): stage-by-stage timing of integrated_driver —
  * which of the four evidence pipelines carries the wall.
  */
object IntDrvProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.localBuilder(32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.range(1000000L).selectExpr("sum(id)").collect()
    s.read.parquet(s"$d/lineitem.parquet").count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      time("deg_stats")(SparkEntry.queries("deg_stats")(s, d).count())
      s.catalog.clearCache(); System.gc()
      time("deg_hub")(SparkEntry.queries("deg_hub")(s, d).count())
      s.catalog.clearCache(); System.gc()
      time("var_driver")(SparkEntry.queries("var_driver")(s, d).count())
      s.catalog.clearCache(); System.gc()
      time("var_summary")(SparkEntry.queries("var_summary")(s, d).count())
      s.catalog.clearCache(); System.gc()
      val df = SparkEntry.queries("integrated_driver")(s, d)
      time("integrated_driver full") {
        df.agg(sum(xxhash64(df.columns.map(col): _*).cast("decimal(38,0)")))
          .collect(); 1L
      }
      s.catalog.clearCache(); System.gc()
    }
    s.stop()
  }
}
