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
}
