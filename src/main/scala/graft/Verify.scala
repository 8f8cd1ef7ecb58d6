package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localBuilder(cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // decade-scaled AQE initialPartitionNum (identical to the old
    // behavior at every driver SF; only >sf10 probe dirs scale it up)
    Sessions.applyShufflePartitions(spark, sfDir, cpus.toInt): Unit
    new java.io.File(outDir).mkdirs()
    // local-iteration filter; the driver never sets this, so the
    // contract (dump every query) is unchanged in driver runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only match {
      case Some(ks) => SparkEntry.queries.filter { case (n, _) => ks(n) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not leave a STALE dump from a previous
        // run in place — the driver's compare would read outdated
        // rows as if current instead of flagging the query broken
        def rmrf(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rmrf)
          f.delete(): Unit
        }
        rmrf(new java.io.File(s"$outDir/$name"))
      }
      // drop operator-cached intermediates between queries (operators
      // cache() frames reused inside their own plan; the caller owns
      // the session-level lifecycle)
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // local-harness dim override (d=768 vector verify); the driver
    // never sets it, so its runs always dump the published d=64 map
    val oracle = sys.env.get("SPARK_GRAFT_ORACLE_DIM") match {
      case Some(dim) =>
        val d = dim.trim.toIntOption.getOrElse(sys.error(
          s"SPARK_GRAFT_ORACLE_DIM must be an integer, got '$dim'"))
        SparkEntry.oracleSqlAt(d)
      case None => SparkEntry.oracleSql
    }
    val json = oracle
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
