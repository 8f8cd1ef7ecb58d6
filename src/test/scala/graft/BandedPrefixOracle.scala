package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** One-off r18 probe: a STRATUM-BOUNDED sf1 oracle for
  * `dedup_ngram_prefix` — the one row whose full-corpus sf1 oracle is
  * DuckDB-infeasible (r17 adjudication: the exact pairwise closure is
  * 1.42e8 candidate pairs; three resource-capped attempts died).
  * Both engines are restricted to the SAME doc-id stratum
  * (doc_id % mod == 0, default mod 3 → 16,667 of sf1's 50,000 docs =
  * 3.3× the whole sf0.1 corpus, in-stratum closure ~(1/3)² of full
  * sf1 ≈ 1.6e7 pairs — DuckDB-feasible under the compare.py resource
  * knobs), so the prefix-filter arithmetic (global (df, shingle)
  * ordering, prefix slicing, candidate-position filters, exact
  * verify) runs one decade above the sf0.1 gate while the oracle's
  * pair closure stays bounded. Usage:
  *   sbt "Test/runMain graft.BandedPrefixOracle <sfDir> <outDir> [mod]"
  * then: python3 tools/compare.py <sfDir> <outDir>
  * NOT part of the library surface.
  */
object BandedPrefixOracle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.scaleprobe/sf1")
    val outDir = if (args.length > 1) args(1) else "/tmp/banded_prefix"
    val mod = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
      .where(pmod(col("doc_id"), lit(mod)) === 0)
    val t0 = System.nanoTime()
    // same operator, same parameters, same output shape as the
    // shipped dedup_ngram_prefix Qdef (DedupQueries.scala) — only the
    // input stratum differs
    val df = Dedup.ngramJaccardPrefix(docs, "doc_id", "text",
      shingleN = 3, minJaccard = 0.6)
      .orderBy(col("da"), col("db"))
    df.write.mode("overwrite")
      .parquet(s"$outDir/dedup_ngram_prefix_band$mod")
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = spark.read
      .parquet(s"$outDir/dedup_ngram_prefix_band$mod").count()

    // banded oracle: the SHIPPED SQL with the stratum pushed into the
    // shingle CTE's documents read — one textual splice, asserted
    // unique so a future CTE refactor cannot silently desync the two
    // engines' inputs
    val sql = SparkEntry.oracleSql("dedup_ngram_prefix")
    val anchor = "FROM documents)"
    require(sql.split(java.util.regex.Pattern.quote(anchor), -1).length == 2,
      s"expected exactly one '$anchor' in the shipped oracle SQL")
    val banded = sql.replace(anchor,
      s"FROM documents WHERE doc_id % $mod = 0)")
    val json = s"""{"dedup_ngram_prefix_band$mod": ${ujsonStr(banded)}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outDir, "oracle_sql.json"),
      json.getBytes("UTF-8")): Unit

    println(f"BANDED-PREFIX sf=$sfDir mod=$mod rows=$rows spark_secs=$secs%.1f")
    spark.stop()
  }

  private def ujsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
