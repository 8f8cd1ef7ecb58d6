package graft

import java.nio.file.{Files, Paths}

/** Test-scope selective Verify: dump only the named queries (plus the
  * full oracle_sql.json) so tools/compare.py can check a single query
  * without a 60-query sweep. Usage:
  *   sbt "Test/runMain graft.VerifyOne <outDir> <query> [query ...]"
  * (SPARK_GRAFT_SF_DIR selects the scale factor, default sf0.01.)
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = args.head
    val names = args.tail.toSeq
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // decade-scaled AQE initialPartitionNum: VerifyOne is the tool
    // that points at sf10/sf30-shaped dirs for oracle ladder
    // extensions, where partitions-=-cores pays the spill tax
    Sessions.applyShufflePartitions(spark, sfDir, 32): Unit
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"VERIFYONE $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
