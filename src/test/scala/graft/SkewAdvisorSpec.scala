package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.SkewAdvisor

/** SkewAdvisor: observed-bytes skew-trigger sizing (r18 doctrine →
  * r19 shipped code). The spec pins the three verdicts the advisor
  * can reach — recommend (skewed + splittable), refuse with the
  * salting note (skewed but ONE mapper, AQE's un-splittable
  * precondition), and defaults-are-fine — plus the broadcast
  * heap-sizing rule's anchors. SkewProbe asserts the end-to-end
  * loop: defaults no-op → advisor recommends → skew_split fires.
  */
class SkewAdvisorSpec extends SparkSpec {

  // ~46 MB of incompressible payload, 90% of rows on one key: the
  // hot partition's COMPRESSED map-output bytes clear the advisor's
  // 1 MiB floor (a compressible constant would not — that trap is
  // exactly what observing real bytes protects against)
  private def skewedFrame(parallelism: Int): DataFrame =
    spark.range(0L, 300000L, 1L, parallelism)
      .select(
        when(col("id") % 10 < 9, lit(7L)).otherwise(col("id")).as("k"),
        concat(md5(col("id").cast("string")),
          md5((col("id") * 31).cast("string")),
          md5((col("id") * 37).cast("string")),
          md5((col("id") * 41).cast("string"))).as("payload"))

  test("observe reads per-partition compressed bytes and mapper " +
    "counts off a materialized shuffle; recommend sizes the trigger") {
    val df = skewedFrame(parallelism = 8).repartition(4, col("k"))
    // materialize THIS frame's query execution with a SQL action (a
    // write/count builds its own; the RDD path — foreachPartition —
    // skips AQE finalization entirely: isFinalPlan stays false and
    // no ShuffleQueryStage ever appears)
    df.collect()
    assert(SkewAdvisor.recommend(spark.range(3).toDF())
      .note.contains("no materialized shuffle"))
    val profiles = SkewAdvisor.observe(df)
    assert(profiles.nonEmpty, "materialized shuffle stage not found")
    val p = profiles.maxBy(_.maxBytes)
    assert(p.numPartitions == 4)
    assert(p.numMappers == 8)
    assert(p.splittable)
    assert(p.maxBytes > (1L << 20),
      s"hot partition ${p.maxBytes} B under the advisor floor — " +
        "payload not incompressible enough")
    assert(p.skewRatio >= 5.0, s"ratio ${p.skewRatio}")
    val rec = SkewAdvisor.recommend(df)
    assert(rec.skewed.contains(p))
    assert(rec.thresholdBytes.contains(math.max(1L << 20, p.maxBytes / 2)))
    // the recommended trigger must CLASSIFY the observed partition:
    // AQE fires when size > max(threshold, factor * median)
    assert(rec.thresholdBytes.get < p.maxBytes)
    assert(5.0 * p.medianBytes < p.maxBytes)
    assert(rec.advisoryBytes.get >= (1L << 20))
    assert(rec.advisoryBytes.get < p.maxBytes,
      "advisory >= hot size would split into one piece (no-op)")
  }

  test("one mapper => unsplittable: the advisor refuses a threshold " +
    "and names the static mitigation") {
    // ONE map task must feed the shuffle — and a bare coalesce(1)
    // does NOT survive (CollapseRepartition folds it into the
    // repartition below, leaving 8 mappers); a single parquet file
    // under maxPartitionBytes is the honest one-mapper scan, which is
    // also how the regime arises in the wild (compacted/coalesced
    // files feeding a keyed shuffle)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_advisor_1map").toString
    skewedFrame(parallelism = 8).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    // parquet is SPLITTABLE: without this pin the scan still splits
    // the single file across defaultParallelism map tasks
    spark.conf.set("spark.sql.files.minPartitionNum", "1")
    try {
      val df = spark.read.parquet(dir).repartition(4, col("k"))
      df.collect()
      val rec = SkewAdvisor.recommend(df)
      assert(rec.skewed.exists(!_.splittable))
      assert(rec.thresholdBytes.isEmpty && rec.advisoryBytes.isEmpty)
      assert(rec.note.contains("ONE mapper"))
      assert(rec.note.contains("saltedJoin"))
    } finally spark.conf.unset("spark.sql.files.minPartitionNum")
  }

  test("balanced shuffle => defaults are fine") {
    val df = spark.range(0L, 100000L, 1L, 8)
      .select(col("id").as("k"),
        concat(md5(col("id").cast("string")),
          md5((col("id") * 31).cast("string"))).as("payload"))
      .repartition(4, col("k"))
    df.collect()
    val rec = SkewAdvisor.recommend(df)
    assert(rec.thresholdBytes.isEmpty)
    assert(rec.note.contains("defaults are fine"))
  }

  test("broadcast threshold heap rule: clamp(heap/256, 1m, 64m) " +
    "reproduces the measured anchors") {
    def gb(n: Long) = n << 30
    // 2 g: 64 m AND 16 m (heap/128) OOM the broadcast build; 8 m
    // passes checksum-identical to the comfortable control (r18+r19)
    assert(Sessions.broadcastThresholdFor(gb(2)) == (8L << 20))
    // ≥16 g reaches the plan-choice cap; tiny heaps hit the floor
    assert(Sessions.broadcastThresholdFor(gb(16)) == (64L << 20))
    assert(Sessions.broadcastThresholdFor(gb(28)) == (64L << 20))
    assert(Sessions.broadcastThresholdFor(gb(8)) == (32L << 20))
    assert(Sessions.broadcastThresholdFor(64L << 20) == (1L << 20))
  }
}
