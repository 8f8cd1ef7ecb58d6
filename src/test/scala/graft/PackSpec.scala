package graft

import org.apache.spark.sql.functions._

import graft.operators.Pack

class PackSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, (i % 7) + 1L)).toDF("id", "tok")

  private def run(parts: Int) =
    Pack.packByTokenBudget(docs(100), "id", "tok", budget = 20L,
      partitions = parts)
      .select("id", "tok", "cum_tokens", "shard_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq

  test("packByTokenBudget equals the sequential prefix-sum reference") {
    var cum = 0L
    val expected = (1 to 100).map { i =>
      val tok = (i % 7) + 1L
      val start = cum
      cum += tok
      (i.toLong, tok, cum, start / 20L)
    }
    assert(run(8) == expected)
  }

  test("result is independent of the partition count") {
    assert(run(1) == run(3) && run(3) == run(13))
  }

  test("the corpus prefix sum runs inside range partitions, not one global window") {
    val plan = Pack.packByTokenBudget(docs(100), "id", "tok", 20L, 8)
      .queryExecution.executedPlan.toString
    // phase 3's running sum is keyed by the range-partition id — the
    // one unpartitioned window in the plan is the numPartitions-row
    // offsets frame, never the corpus
    assert(plan.contains("windowspecdefinition(_pid"),
      s"expected a _pid-partitioned window:\n$plan")
  }
}
