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

  test("sequenceAudit counts boundary-crossing docs per shard") {
    // tokens 5,3,4,6,2,4,0 -> cum 5,8,12,18,20,24,24; seqLen 8,
    // budget 16 (aligned): only doc 4 (span 12..17) crosses a cut
    val d = Seq((1L, 5L), (2L, 3L), (3L, 4L), (4L, 6L), (5L, 2L),
      (6L, 4L), (7L, 0L)).toDF("id", "tok")
    val out = Pack.sequenceAudit(
      Pack.packByTokenBudget(d, "id", "tok", budget = 16L, partitions = 3),
      "tok", seqLen = 8L)
      .collect()
      .map(r => r.getAs[Long]("shard_id") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("shard_tokens"),
          r.getAs[Long]("n_seqs"), r.getAs[Long]("crossing_docs"),
          r.getAs[Double]("crossing_frac"))))
      .toMap
    assert(out(0L) == ((4L, 18L, 3L, 1L, 0.25)))
    // zero-token doc 7 is zero-width: no crossing, no span movement
    assert(out(1L) == ((3L, 6L, 1L, 0L, 0.0)))
    assert(out.size == 2)
  }

  test("sequenceAudit: a zero-token doc at offset 0 never moves the span") {
    // doc 1 has 0 tokens at cum_tokens 0: its last-occupied offset is
    // -1, where integral division truncates (Spark) vs floors
    // (DuckDB) differently — the span bounds must be EXCLUDED, not
    // computed, or n_seqs diverges cross-engine
    val d = Seq((1L, 0L), (2L, 5L), (3L, 3L)).toDF("id", "tok")
    val out = Pack.sequenceAudit(
      Pack.packByTokenBudget(d, "id", "tok", budget = 16L, partitions = 2),
      "tok", seqLen = 8L)
      .collect().map(r => (r.getAs[Long]("n_docs"),
        r.getAs[Long]("shard_tokens"), r.getAs[Long]("n_seqs"),
        r.getAs[Long]("crossing_docs")))
    // spans 0..4 and 5..7: one sequence, no crossings; the zero-width
    // doc counts in n_docs only
    assert(out.toSeq == Seq((3L, 8L, 1L, 0L)))
  }

  test("sequenceAudit: an all-zero-token shard realizes zero sequences") {
    val d = Seq((1L, 0L), (2L, 0L)).toDF("id", "tok")
    val out = Pack.sequenceAudit(
      Pack.packByTokenBudget(d, "id", "tok", budget = 16L, partitions = 1),
      "tok", seqLen = 8L)
      .collect().map(r => (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_seqs"), r.getAs[Long]("crossing_docs")))
    assert(out.toSeq == Seq((2L, 0L, 0L)))
  }
}
