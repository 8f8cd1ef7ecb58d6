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

  /** Mixture SOLVER on top of `stratifiedSample`'s hash filter: given
    * TARGET composition weights per stratum (Pile/DoReMi-style domain
    * mixing), derive each stratum's sampling rate from the observed
    * corpus counts instead of hand-tuning constants. Without
    * upsampling, the largest achievable mixed corpus is
    * N* = min_s(count_s / w_s); stratum s then samples at rate
    * N*·w_s / count_s (the binding stratum rides at rate 1.0).
    *
    * Returns the per-stratum audit summary: observed count, target
    * weight, quantized rate cutoff, selected count, and the achieved
    * composition fraction — the frame a pipeline logs to show the
    * realized mix vs the spec. Strata absent from `weights` are
    * excluded (weight 0); weighted strata absent from the corpus drop
    * out of the solve (their achievable contribution is 0, so they
    * cannot bind).
    *
    * Scale design: counts are one partial-aggregated groupBy on the
    * stratum key (stratum cardinality = domains, tiny); the weights
    * table, the 1-row N* aggregate and the derived rates frame all
    * broadcast, so the corpus-side selection is a narrow
    * broadcast-join + hash filter directly behind the scan — the
    * corpus shuffles only once, for the per-stratum selected-count
    * aggregate (partial agg, domain-cardinality groups).
    */
  def mixToWeights(
      df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, Double], salt: String): DataFrame = {
    require(weights.nonEmpty, "mixToWeights: weights must be non-empty")
    weights.foreach { case (k, w) =>
      require(w > 0.0, s"mixToWeights: non-positive weight for $k: $w") }
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toSeq.sortBy(_._1).toDF(strataCol, "target_w")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
    // cached: the weighted-counts frame is read by the N* aggregate,
    // the rates derivation AND the final output — without the cache
    // each consumer re-scans the corpus for the counts (4 scans
    // observed). Domain-cardinality rows, bounded at any scale.
    val wc = counts.join(broadcast(wdf), Seq(strataCol)).cache()
    val nstar = wc.agg(min(col("n_docs") / col("target_w")).as("nstar"))
    // rate quantized to hash buckets; +1e-9 keeps floor() off the
    // representation boundary identically in both engines
    val rates = wc.crossJoin(broadcast(nstar))
      .withColumn("rate_buckets",
        floor(least(col("nstar") * col("target_w") / col("n_docs"),
          lit(1.0)) * lit(Buckets) + lit(1e-9)))
    val sel = df
      .join(broadcast(rates.select(col(strataCol), col("rate_buckets"))),
        Seq(strataCol))
      .where(bucketOf(col(idCol), salt) < col("rate_buckets"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_selected"))
    val total = sel.agg(sum(col("n_selected")).as("total_sel"))
    // sel/total are domain-cardinality aggregates but Spark has no
    // stats for them — broadcast explicitly or the audit join plans
    // a sort-merge against the tiny rates frame
    rates.join(broadcast(sel), Seq(strataCol), "left")
      .crossJoin(broadcast(total))
      .select(col(strataCol),
        col("n_docs").cast("long").as("n_docs"),
        round(col("target_w"), 6).as("target_w"),
        col("rate_buckets").cast("long").as("rate_buckets"),
        coalesce(col("n_selected"), lit(0L)).cast("long")
          .as("n_selected"),
        round(coalesce(col("n_selected"), lit(0L)).cast("double") /
          col("total_sel") + lit(1e-9), 6).as("achieved_frac"))
  }
}
