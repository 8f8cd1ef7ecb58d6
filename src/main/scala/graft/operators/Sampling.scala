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

  /** EXACT-k per-stratum sample — the fixed-SIZE split carve (a
    * 10 k-doc eval set per source, a human-review batch per
    * language): each stratum keeps its k smallest-hash rows
    * (md5(id|salt) 32-bit decode, ties by id). `stratifiedSample`
    * keeps a PROPORTION; this keeps a SIZE — the other half of the
    * split story, with the same determinism guarantees (reproducible
    * across runs/engines/partitionings, re-drawable via salt). Note
    * exact-k is NOT append-stable by nature: a new row hashing into
    * the top k displaces the current k-th — version the salt per
    * snapshot when stability matters.
    *
    * Scale shape: the selection is a BOUNDED map-side aggregate
    * (functions.TopKAgg under ObjectHashAggregate — the knnJoin
    * device), so each map partition contributes at most k rows per
    * stratum to the exchange and no stratum is ever sorted whole.
    * The window-rank formulation this replaces shuffles and sorts
    * every stratum END TO END to emit k rows — at 100 TB that is a
    * full-corpus sort for a fixed-size sample. Integral ids
    * (TopKAgg contract); output (stratum, id, skey, rnk) with id
    * widened to long.
    */
  def sampleExactK(
      df: DataFrame, strataCol: String, idCol: String,
      k: Int, salt: String): DataFrame = {
    require(k > 0, s"sampleExactK: k must be positive: $k")
    df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"sampleExactK id '$idCol' must be integral, got ${other.sql}")
    }
    val topk = udaf(new graft.functions.TopKAgg(k))
    df.select(col(strataCol), col(idCol))
      .withColumn("skey", TextFns.hexHash32(
        concat(col(idCol).cast("string"), lit("|" + salt))))
      // TopKAgg keeps (score DESC, id ASC); smallest hash first via
      // negation — exact in double for 32-bit hash values
      .groupBy(col(strataCol))
      .agg(topk(-col("skey").cast("double"), col(idCol).cast("long"))
        .as("tk"))
      .select(col(strataCol), posexplode(col("tk")).as(Seq("pos", "pick")))
      .select(col(strataCol), col("pick.id").as(idCol),
        (-col("pick.score")).cast("long").as("skey"),
        (col("pos") + 1).cast("long").as("rnk"))
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

  /** Temperature-scaled mixture (the mT5/XLM-R multilingual sampling
    * rule): target weights are DERIVED from the observed stratum
    * counts, w_s ∝ count_s^(1/T), instead of hand-specified — T = 1
    * reproduces the corpus as-is, T → ∞ approaches uniform across
    * strata, T = 2 (the common α = 0.5 setting) upsamples the tail
    * relative to the head. The N*-solve, selection, and audit frame
    * are `mixToWeights`' exactly; only the weight derivation
    * differs.
    *
    * Cross-engine protocol: the raw exponentiated weight is rounded
    * to 6 dp (guarded) before ANY arithmetic consumes it, because
    * pow is the one libm call the two engines may round differently
    * at the last ulp; every downstream value derives from the
    * rounded weight with the same operation order. The solve uses
    * the UNNORMALIZED weights (the N* solve is scale-invariant, and
    * skipping the Σw division keeps an order-sensitive double sum
    * out of the filter path); the normalized share appears only in
    * the rounded display column `target_w`.
    *
    * Scale design: identical to mixToWeights — one stratum-count
    * groupBy, broadcast weight/rate frames, corpus shuffles once
    * for the selected-count audit.
    */
  def mixTemperature(
      df: DataFrame, strataCol: String, idCol: String,
      temperature: Double, salt: String): DataFrame = {
    require(temperature > 0.0,
      s"mixTemperature: temperature must be positive, got $temperature")
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_docs"))
    // cached: the N* aggregate, the Σw display normalizer, the rates
    // derivation and the final output all read it; stratum-cardinality
    val wc = counts.withColumn("wraw",
      round(pow(col("n_docs").cast("double"), lit(1.0 / temperature))
        + lit(1e-12), 6)).cache()
    val nstar = wc.agg(min(col("n_docs") / col("wraw")).as("nstar"))
    val wtot = wc.agg(sum(col("wraw")).as("wtot"))
    val rates = wc.crossJoin(broadcast(nstar))
      .withColumn("rate_buckets",
        floor(least(col("nstar") * col("wraw") / col("n_docs"),
          lit(1.0)) * lit(Buckets) + lit(1e-9)))
    val sel = df
      .join(broadcast(rates.select(col(strataCol), col("rate_buckets"))),
        Seq(strataCol))
      .where(bucketOf(col(idCol), salt) < col("rate_buckets"))
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_selected"))
    val total = sel.agg(sum(col("n_selected")).as("total_sel"))
    rates.join(broadcast(sel), Seq(strataCol), "left")
      .crossJoin(broadcast(wtot))
      .crossJoin(broadcast(total))
      .select(col(strataCol),
        col("n_docs").cast("long").as("n_docs"),
        round(col("wraw") / col("wtot") + lit(1e-9), 6).as("target_w"),
        col("rate_buckets").cast("long").as("rate_buckets"),
        coalesce(col("n_selected"), lit(0L)).cast("long")
          .as("n_selected"),
        round(coalesce(col("n_selected"), lit(0L)).cast("double") /
          col("total_sel") + lit(1e-9), 6).as("achieved_frac"))
  }

  /** DSIR importance log-weights (Xie et al. 2023, arXiv:2302.03169,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw-pool document by how target-domain-like its
    * hashed n-gram profile is, log w(x) = Σ_features
    * [ln p̂_target(bucket) − ln p̂_raw(bucket)] — the closed-form
    * bag-of-hashed-ngrams importance estimator the paper selects
    * pretraining data with (resampling itself is then
    * `stratifiedSample`-style rate selection on the ranked weights).
    *
    * Features are word unigrams + bigrams WITH multiplicity, hashed
    * into `buckets` via the repo's cross-engine md5 device
    * (TextFns.hexHash32); both class models use add-one smoothing
    * over the `buckets` outcomes. A doc with no features (impossible
    * under the one-empty-token wsTokens contract) would simply be
    * absent.
    *
    * Scale design: BOTH model fits are single partial-aggregated
    * passes bounded at `buckets` rows; the raw corpus is scanned
    * ONCE — its per-doc bucket counts (cached) feed the raw-side
    * model AND the scoring join, which is a broadcast of the
    * `buckets`-row log-ratio table followed by one map-side-combined
    * per-doc sum. Nothing pairwise, nothing superlinear; the only
    * corpus-keyed shuffle is the (id, bucket) partial count.
    */
  def dsirLogWeights(
      target: DataFrame, raw: DataFrame, idCol: String, textCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, s"dsirLogWeights: buckets must be positive: $buckets")
    def bucketed(df: DataFrame) = df
      .select(col(idCol), TextFns.wsTokens(col(textCol)).as("tk"))
      .select(col(idCol), explode(concat(col("tk"),
        TextFns.shinglesOfTokens(col("tk"), 2))).as("feat"))
      .select(col(idCol), (TextFns.hexHash32(col("feat")) % buckets).as("bkt"))
    // model frames are ≤ `buckets` rows — cached because each feeds
    // both the totals aggregate and the log-ratio join
    val tb = bucketed(target).groupBy(col("bkt"))
      .agg(count(lit(1)).as("tcnt")).cache()
    val dc = bucketed(raw).groupBy(col(idCol), col("bkt"))
      .agg(count(lit(1)).as("n")).cache()
    val rb = dc.groupBy(col("bkt")).agg(sum(col("n")).as("rcnt")).cache()
    val totals = tb.agg(sum(col("tcnt")).cast("double").as("tt"))
      .crossJoin(rb.agg(sum(col("rcnt")).cast("double").as("tr")))
    val lr = tb.join(rb, Seq("bkt"), "full_outer")
      .select(col("bkt"),
        coalesce(col("tcnt"), lit(0L)).as("tcnt"),
        coalesce(col("rcnt"), lit(0L)).as("rcnt"))
      .crossJoin(broadcast(totals))
      .select(col("bkt"),
        (log((col("tcnt") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("rcnt") + 1).cast("double") / (col("tr") + buckets)))
          .as("lr"))
    dc.join(broadcast(lr), Seq("bkt"))
      .groupBy(col(idCol))
      .agg(sum(col("n")).cast("long").as("n_feats"),
        // +1e-9 before rounding: the repo-wide nudge off the decimal
        // rounding boundary for order-dependent double sums (both
        // engines accumulate the per-bucket terms in different
        // orders; mirrored in the oracle)
        round(sum(col("n") * col("lr")) + lit(1e-9), 6).as("dsir_logw"))
  }
}
