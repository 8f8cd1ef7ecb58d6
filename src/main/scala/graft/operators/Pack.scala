package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shard packing for training-data preparation: assign documents, in
  * a deterministic global order, to contiguous shards of at most
  * `budget` tokens — the step that turns a cleaned corpus into
  * fixed-size tokenizer/training shards.
  *
  * Scale design — the whole point of this operator: the naive plan is
  * `sum(tokens) OVER (ORDER BY id)`, a GLOBAL unpartitioned window
  * that drags the entire corpus through one task. Instead the prefix
  * sum is two-phase, the classic distributed scan:
  *
  *   1. range-repartition by id (contiguous id ranges per partition);
  *   2. one row PER PARTITION of totals → cumulative offsets via a
  *      window over numPartitions rows (driver-scale by definition —
  *      this is the only single-partition step and it never grows
  *      with the data);
  *   3. broadcast the offsets back and run the running sum WITHIN
  *      each partition, all partitions in parallel.
  *
  * The result equals the global cumulative sum regardless of where
  * the sampled range boundaries fall (prefix sums are associative),
  * so the output is deterministic even though RangePartitioner
  * samples. The frame is cached because phases 2 and 3 both read it —
  * without the cache the range exchange could resample between the
  * two subtrees and the offsets would describe different partitions.
  *
  * `shard_id = (cum_tokens - tokens) div budget`: a document belongs
  * to the shard its STARTING offset falls in (contiguous-offset
  * sharding; a document may straddle a boundary, the standard
  * pretraining-shard contract).
  */
object Pack {

  def packByTokenBudget(
      docs: DataFrame, idCol: String, tokenCol: String,
      budget: Long, partitions: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    // cached: the offsets aggregate and the final join both read it,
    // and _pid must be IDENTICAL in both (graft.Caching lifecycle)
    val withPid = docs
      .repartitionByRange(partitions, col(idCol))
      .withColumn("_pid", spark_partition_id())
      .cache()
    val offsets = withPid
      .groupBy(col("_pid"))
      .agg(sum(col(tokenCol)).as("_ptot"))
      .withColumn("_offset", coalesce(
        sum(col("_ptot")).over(Window.orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("_pid"), col("_offset"))
    val perPartition = Window.partitionBy(col("_pid")).orderBy(col(idCol))
    withPid
      .join(broadcast(offsets), Seq("_pid"))
      .withColumn("cum_tokens",
        col("_offset") + sum(col(tokenCol)).over(perPartition))
      // exact integral division via the registered `div` function —
      // an expr() splice would break for token column names needing
      // backticks, and double division would round, not floor
      .withColumn("shard_id", call_function("div",
        col("cum_tokens") - col(tokenCol), lit(budget)))
      .drop("_pid", "_offset")
  }

  /** Sequence-boundary fragmentation audit over `packByTokenBudget`
    * output: in concat-and-chunk pretraining (the GPT-style packing
    * the shard layout feeds), the token stream is cut into fixed
    * `seqLen` sequences, and a document whose span straddles a cut
    * is fragmented across two training sequences (attention can
    * never see it whole). Per shard this reports how bad that is:
    * doc/token counts, realized sequence span, boundary-crossing doc
    * count and fraction — the metric a data pipeline tracks when
    * choosing seqLen vs document-length distribution.
    *
    * Offsets are GLOBAL (cum_tokens), so sequence cuts align across
    * shard boundaries when `budget` is a multiple of `seqLen` — pass
    * such a pair or shard-edge sequences span two shards.
    *
    * Scale: pure arithmetic on the packed frame plus ONE
    * partial-aggregated groupBy on shard_id (bounded groups by the
    * budget contract). Zero-token docs are zero-width spans: their
    * span bounds are EXCLUDED from the _sf/_sl aggregates outright
    * (null, skipped by min/max/crossing) rather than computed — at
    * cum_tokens == 0 the last-occupied offset is −1, whose integral
    * division truncates toward zero in Spark but floors in SQL
    * engines (DuckDB //), so a computed bound would diverge
    * cross-engine. They still count toward n_docs/shard_tokens.
    */
  def sequenceAudit(
      packed: DataFrame, tokenCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val start = col("cum_tokens") - col(tokenCol)
    val endM1 = col("cum_tokens") - 1 // last occupied offset
    val occupied = col(tokenCol) > 0
    val seqFirst = when(occupied, call_function("div", start, lit(seqLen)))
    val seqLast = when(occupied, call_function("div", endM1, lit(seqLen)))
    packed
      .select(col("shard_id"), col(tokenCol),
        seqFirst.as("_sf"), seqLast.as("_sl"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col(tokenCol)).cast("long").as("shard_tokens"),
        // an all-zero-token shard realizes no sequences -> 0
        coalesce(max(col("_sl")) - min(col("_sf")) + 1, lit(0L))
          .cast("long").as("n_seqs"),
        sum(when(col("_sl") > col("_sf"), 1L).otherwise(0L))
          .cast("long").as("crossing_docs"))
      .withColumn("crossing_frac",
        round(col("crossing_docs").cast("double") / col("n_docs")
          + lit(1e-9), 6))
  }
}
