package graft

import org.apache.spark.sql.SparkSession

/** Throwaway local smoke-main (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${e.count()}")
    e.show(5, false)
    spark.stop()
  }
}
