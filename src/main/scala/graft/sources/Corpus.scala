package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Corpus ingestion + persistence — the Spark-native re-expression of
  * the reference's file-based corpus flow
  * (reference: backend/app/core/corpus_builder.py — JSON paper dumps →
  * cleaned corpus; backend/app/core/vector_store.py — persisted
  * embedding collections).
  *
  * Scale rules baked in:
  *  - readers take an EXPLICIT schema — inferSchema is a full extra
  *    pass over 100 TB and type-drifts between files; a declared
  *    schema is one scan and stable.
  *  - `_corrupt_record` is retained under PERMISSIVE mode so bad rows
  *    are quarantineable instead of killing the job.
  *  - writes are either partitioned (partition pruning for
  *    time/source-sliced reads) or bucketed (shuffle-free equi-joins
  *    on the bucket key across tables bucketed the same way).
  */
object Corpus {

  /** The documents-table schema (matches TESTDATA's documents). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The embeddings-table schema (vector as array<float>). */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** JSON-lines corpus reader with a declared schema; malformed rows
    * land in `_corrupt_record` (add it to the schema to quarantine).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .json(path)

  /** CSV corpus reader with a declared schema (header expected). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Parquet writer partitioned by low-cardinality columns: reads
    * filtered on those columns prune whole directories
    * (PartitionFilters in the scan — no data touched outside the
    * slice).
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed managed table: both sides of a repeated equi-join
    * bucketed by the join key skip the exchange entirely — the
    * pre-shuffle is paid ONCE at write time instead of per query.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
}
