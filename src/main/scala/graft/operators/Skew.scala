package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins whose key distribution has hot
  * keys (the classic 100 TB failure mode: one reducer gets the hot
  * key's entire partition while the rest idle).
  *
  * AQE's skew-join splitting (on by default) handles sort-merge skew
  * at runtime; explicit salting is still the right tool when (a) the
  * skewed side feeds an AGGREGATION rather than a join, or (b) the
  * dim side is small enough to replicate but too large to broadcast.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic
    * salt in [0, saltBuckets) derived from stable row content, the
    * small side is replicated once per salt value, and the join key
    * becomes (key, salt) — hot keys spread over `saltBuckets`
    * reducers. Row multiplicity: |small| × saltBuckets, so keep the
    * replicated side dim-table-sized.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      saltCol: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    // a null / non-castable salt source coalesces to bucket 0 rather
    // than producing a null salt (which the inner join would silently
    // drop, diverging from the unsalted join's semantics)
    val salted = big.withColumn("_salt",
      pmod(coalesce(saltCol.cast("long"), lit(0L)), lit(saltBuckets.toLong)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation for hot GROUP BY keys:
    * count/sum first over (key, salt), then re-aggregate over key.
    * Spark's own partial aggregation already does this per-partition;
    * the explicit salt ALSO splits the post-shuffle reduce of a hot
    * key across `saltBuckets` reducers — use when one key dominates
    * the corpus (empty-string text, null-ish defaults).
    */
  def saltedCountSum(
      df: DataFrame, key: String, valueCol: String,
      saltCol: Column, saltBuckets: Int): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    df.withColumn("_salt",
      pmod(coalesce(saltCol.cast("long"), lit(0L)), lit(saltBuckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_c"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_c")).as("cnt"), sum(col("_s")).as("sum_value"))
  }
}
