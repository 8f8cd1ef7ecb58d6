package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata star schema.
  *
  * Every operator in this library is a pure `DataFrame => DataFrame`
  * transform; these helpers only bind the parquet inputs. At cluster
  * scale the same operators run over partitioned/bucketed tables —
  * nothing here assumes single-file input.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts normalized to a LONG of nanoseconds since epoch, so all
    * downstream time math is integer (see operators.Events) and
    * engine-stable bit-for-bit.
    *
    * Testdata regens have shipped two physical encodings:
    *  - parquet TIMESTAMP(NANOS): Spark 4 refuses it natively;
    *    nanosAsLong surfaces the raw long — already canonical.
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): with NTZ
    *    inference off Spark reads the stored micros verbatim as
    *    TimestampType; unix_micros() recovers the exact value (no
    *    timezone math — sessions pin UTC), ×1000 → nanos.
    * Any third encoding fails loudly here rather than 9 queries deep.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected type $other — testdata regen " +
          "drift; extend the Tables.events normalization branch")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
