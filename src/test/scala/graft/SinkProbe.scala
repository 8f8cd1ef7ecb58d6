package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r14 probe: StreamingSink.upsertBatch cost vs store size.
  * Builds a 5 M-row bucket-partitioned store (64 buckets), then
  * upserts a 1 k-key micro-batch and measures wall against (a) a
  * batch touching ALL buckets and (b) a full-store rewrite — the
  * claim under test is that a micro-batch costs O(touched
  * partitions), not O(store). Not part of the API.
  */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.streaming.StreamingSink

    val Buckets = 64
    val N = 5000000L
    val dir = "/tmp/sink_probe_store"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // seed the store: 5 M keys at v0 (the O(store) baseline write)
    val base = spark.range(N).select(col("id").as("key"),
      lit(0L).as("version"),
      concat(lit("p"), col("id")).as("payload"),
      lit(false).as("deleted"))
    timed(s"seed ${N / 1000000} M keys, $Buckets buckets") {
      StreamingSink.upsertBatch(base, dir, Seq("key"), "version", Buckets)
    }

    // a bucket-local micro-batch: 1 k keys that all hash into ONE
    // bucket (keys are hash-distributed, so "contiguous ids" still
    // spray across buckets — locality must be constructed the way a
    // real partial-recrawl batch would be)
    val micro = spark.range(200000).select(col("id").as("key"))
      .where(pmod(xxhash64(col("key")), lit(Buckets.toLong)) === 3L)
      .limit(1000)
      .select(col("key"), lit(1L).as("version"),
        lit("u1").as("payload"), lit(false).as("deleted"))
    timed("micro-batch 1 k keys, one bucket") {
      StreamingSink.upsertBatch(micro, dir, Seq("key"), "version", Buckets)
    }
    // the same 1 k keys sprayed across all buckets: the O(touched)
    // contrast — identical batch size, 64× the partitions read
    val spray = spark.range(1000).select(col("id").as("key"),
      lit(1L).as("version"), lit("u1").as("payload"),
      lit(false).as("deleted"))
    timed("micro-batch 1 k keys, sprayed all buckets") {
      StreamingSink.upsertBatch(spray, dir, Seq("key"), "version", Buckets)
    }

    // adversarial batch: 10 k keys STRIDED so every bucket is
    // touched — the worst case degenerates to a full-store merge
    val wide = spark.range(10000)
      .select((col("id") * 499L).as("key"), lit(2L).as("version"),
        lit("u2").as("payload"), lit(false).as("deleted"))
    timed("wide batch 10 k keys, all buckets") {
      StreamingSink.upsertBatch(wide, dir, Seq("key"), "version", Buckets)
    }

    // sanity: the store resolved every layer
    val cur = StreamingSink.readCurrent(spark, dir, "deleted")
    val v = cur.groupBy(col("version")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"PROBE versions: $v")
    spark.stop()
  }
}
