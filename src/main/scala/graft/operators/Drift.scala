package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift telemetry between corpus snapshots — the
  * monitoring leg of a training-data pipeline: when today's crawl
  * shifts against yesterday's (length distributions, quality-score
  * bands, language mix), the mixture and filter thresholds derived
  * from the old snapshot silently mis-calibrate. PSI (population
  * stability index, the standard model-monitoring statistic) per
  * stratum quantifies that shift on a fixed bucketing:
  *
  *   PSI = Σ_buckets (p_cur − p_base) · ln(p_cur / p_base)
  *
  * with proportions floored at `minP` so empty buckets contribute a
  * large-but-finite term (the standard smoothing). The conventional
  * ladder: < 0.1 stable, < 0.25 moderate, ≥ 0.25 high.
  */
object Drift {

  /** PSI per stratum between two snapshot frames that each carry
    * (strataCol, bucketCol) — the caller fixes the bucketing (same
    * edges on BOTH sides; bucket ids must be comparable).
    *
    * Contract: every stratum must appear in both snapshots (a
    * stratum wholly absent from one side has no defined base/current
    * total; gate upstream).
    *
    * Scale: each snapshot collapses to (stratum, bucket) counts in
    * one partial-aggregated pass — strata × buckets rows; everything
    * after the two scans (outer align, per-stratum total windows,
    * PSI fold) runs on that bounded frame.
    */
  def psi(
      base: DataFrame, current: DataFrame,
      strataCol: String, bucketCol: String,
      minP: Double = 1e-6): DataFrame = {
    def counts(df: DataFrame) =
      df.groupBy(col(strataCol), col(bucketCol))
        .agg(count(lit(1)).as("cnt"))
    psiFromCounts(counts(base), counts(current),
      strataCol, bucketCol, "cnt", minP)
  }

  /** PSI from PRE-AGGREGATED (stratum, bucket, count) frames — the
    * entry point for monitoring pipelines that already maintain
    * bucket counts (a Structured Streaming windowed aggregation's
    * micro-batch output via foreachBatch, a rollup table, a
    * baseline snapshot) rather than raw rows.
    *
    * Input frames are re-aggregated to one row per (stratum, bucket)
    * internally, so an unconsolidated rollup with duplicate keys
    * cannot fan out the full_outer join. Consolidation treats
    * duplicate keys as PARTIAL counts and sums them — correct for
    * split rollups, but a retried append of identical rows doubles
    * the counts (PSI survives a FULL retry only because proportions
    * scale uniformly; a PARTIAL retry skews them) — exactly-once
    * delivery of count rows remains the caller's responsibility.
    * The extra aggregate is free at scale — both frames are already
    * strata × buckets sized, and when the input IS unique the
    * same-keyed re-aggregate reuses its partitioning (no added
    * shuffle).
    *
    * Consolidation is NOT window merging: each call computes ONE
    * distribution per stratum, so a multi-window micro-batch (two
    * closed streaming windows in one foreachBatch frame) must be
    * sliced and scored one window per call — summing across windows
    * would average two distinct snapshots into a falsely-stable PSI.
    * StreamingSpec's drift monitor pins that per-window loop.
    */
  def psiFromCounts(
      baseCounts: DataFrame, currentCounts: DataFrame,
      strataCol: String, bucketCol: String, cntCol: String,
      minP: Double = 1e-6): DataFrame = {
    require(minP > 0.0 && minP < 1.0, s"minP out of (0,1): $minP")
    def consolidated(df: DataFrame, out: String) =
      df.groupBy(col(strataCol), col(bucketCol))
        .agg(sum(col(cntCol)).as(out))
    val byStratum = Window.partitionBy(col(strataCol))
    val joined = consolidated(baseCounts, "cnt_b")
      .join(consolidated(currentCounts, "cnt_c"),
        Seq(strataCol, bucketCol), "full_outer")
      .select(col(strataCol), col(bucketCol),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
        coalesce(col("cnt_c"), lit(0L)).as("cnt_c"))
      .withColumn("tot_b", sum(col("cnt_b")).over(byStratum))
      .withColumn("tot_c", sum(col("cnt_c")).over(byStratum))
    val pb = greatest(col("cnt_b").cast("double") / col("tot_b"),
      lit(minP))
    val pc = greatest(col("cnt_c").cast("double") / col("tot_c"),
      lit(minP))
    joined
      .withColumn("term", (pc - pb) * log(pc / pb))
      .groupBy(col(strataCol))
      .agg(max(col("tot_b")).cast("long").as("n_base"),
        max(col("tot_c")).cast("long").as("n_current"),
        round(sum(col("term")) + lit(1e-9), 6).as("psi"))
      .withColumn("drift_level",
        when(col("psi") < 0.1, lit("stable"))
          .when(col("psi") < 0.25, lit("moderate"))
          .otherwise(lit("high")))
  }
}
