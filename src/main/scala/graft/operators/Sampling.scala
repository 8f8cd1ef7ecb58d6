package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
