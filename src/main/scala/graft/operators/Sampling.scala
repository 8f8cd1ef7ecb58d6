package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deterministic stratified sampling — the training-mix step of a
  * data pipeline: downsample each stratum (source, language, quality
  * band) at its own rate to hit a target corpus composition.
  *
  * Sampling is HASH-based, not RNG-based: a row is kept iff
  * md5(id|salt) falls below the stratum's rate cutoff. That makes the
  * sample (a) reproducible across runs, engines and partitionings,
  * (b) stable under corpus growth (existing rows never flip in/out
  * when new rows arrive), and (c) a pure narrow filter — no shuffle,
  * no state, evaluated inside whole-stage codegen right behind the
  * scan, so at 100 TB the discarded fraction never leaves the scan
  * stage. Changing `salt` draws an independent sample.
  */
object Sampling {

  /** Hash-bucket resolution: rates are quantized to 1/1000ths. */
  val Buckets = 1000

  /** Bucket in [0, Buckets) for a row id under `salt` — first 8 md5
    * hex chars of "id|salt" as an integer, mod Buckets (cross-engine
    * reproducible; the oracle decodes the same prefix positionally).
    */
  def bucketOf(id: Column, salt: String): Column =
    pmod(TextFns.hexHash32(concat(id.cast("string"), lit("|" + salt))),
      lit(Buckets))

  /** Keep each row of its stratum with that stratum's rate (rates in
    * [0,1], quantized to 1/Buckets); strata absent from `rates` use
    * `defaultRate`. Adds the sampling bucket as `bucket` (useful for
    * audits and for carving held-out splits from the same hash).
    */
  def stratifiedSample(
      df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double,
      salt: String): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rate out of [0,1]: $r"))
    val cutoff = rates.foldLeft(
      lit((defaultRate * Buckets).round.toInt)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * Buckets).round.toInt))
          .otherwise(acc)
    }
    df.withColumn("bucket", bucketOf(col(idCol), salt))
      .where(col("bucket") < cutoff)
  }

  /** Deterministic training-order shuffle + sharding — the global
    * interleave every pre-training pipeline runs before writing
    * training shards: rows get a hash key (md5(id|salt), the same
    * engine-stable 32-bit decode the sampler uses), shard =
    * key mod numShards, position = rank of the key within the shard.
    * Hash-ordering instead of RNG makes the "shuffle" reproducible
    * across runs/engines/partitionings, stable under corpus growth
    * (appended rows interleave without moving existing ones within
    * their shard order), and re-drawable via `salt` (a new salt is a
    * fresh epoch permutation).
    *
    * Scale: key/shard are narrow codegen'd projections; the position
    * is a per-shard window — ONE shuffle keyed by shard, then a sort
    * within each shard partition, which is exactly the
    * repartition + sortWithinPartitions work a shard writer performs
    * anyway. Shard cardinality is the parallelism knob: at 100 TB,
    * numShards is sized so a shard fits a writer task (~1 GB), and
    * the window never sees more than corpus/numShards rows per
    * partition. No global sort, no driver state.
    *
    * Output: input columns + (shard, pos); pos is 1-based within
    * shard, ties on the 32-bit key broken by id.
    */
  def shuffleShards(
      df: DataFrame, idCol: String, salt: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val key = TextFns.hexHash32(
      concat(col(idCol).cast("string"), lit("|" + salt)))
    df.withColumn("skey", key)
      .withColumn("shard", pmod(col("skey"), lit(numShards)).cast("long"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("skey"), col(idCol))).cast("long"))
      .drop("skey")
  }
}
