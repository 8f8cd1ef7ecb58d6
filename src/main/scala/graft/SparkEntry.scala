package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every operator from SURVEY.md §2 appears once in `queries`, with a
  * DuckDB-equivalent oracle in `oracleSql` (column names/aliases match
  * exactly; rounding and ordering are mirrored on both sides).
  */
object SparkEntry {

  val allDefs: Seq[Qdef] =
    OlapQueries.defs ++ VectorQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ EventQueries.defs ++ EmbedQueries.defs ++
      CorpusQueries.defs ++ StatsQueries.defs ++ VariantQueries.defs ++
      NewsQueries.defs ++ GapQueries.defs ++ GraphQueries.defs ++
      CiteQueries.defs ++ BriefQueries.defs ++ DiscoverQueries.defs ++
      HotTopicQueries.defs ++ MultimodalQueries.defs ++
      IntegratedQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Dense top-20 cosine search — the reference's core capability.
    */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "vs_dense_topk").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** `oracleSql` rebound to a non-default stored-vector dimension —
    * the d=768 verify harness (the reference embedder's real width).
    * Identical to `oracleSql` except the two PQ rows whose subspace
    * arithmetic bakes in dim/m. NOT part of the driver contract.
    */
  def oracleSqlAt(dim: Int): Map[String, String] =
    oracleSql ++ VectorQueries.oracleOverridesAt(dim)
}
