package graft

import org.apache.spark.sql.functions._

import graft.operators.SingleCell

class TrajectorySpec extends SparkSpec {
  import spark.implicits._

  /** Dense average-rank Spearman computed the schoolbook way — the
    * ground truth the sparse closed-form recovery must reproduce.
    */
  private def denseSpearman(a: Seq[Double], b: Seq[Double]): Double = {
    def avgRanks(xs: Seq[Double]): Seq[Double] = {
      val sorted = xs.sorted
      xs.map { x =>
        val lo = sorted.indexWhere(_ == x) + 1
        val hi = sorted.lastIndexWhere(_ == x) + 1
        (lo + hi) / 2.0
      }
    }
    val ra = avgRanks(a)
    val rb = avgRanks(b)
    val n = a.size.toDouble
    val sab = ra.zip(rb).map { case (x, y) => x * y }.sum
    val sa = ra.sum; val sb = rb.sum
    val sa2 = ra.map(x => x * x).sum
    val sb2 = rb.map(x => x * x).sum
    (n * sab - sa * sb) /
      math.sqrt((n * sa2 - sa * sa) * (n * sb2 - sb * sb))
  }

  // 8 cells with tied pseudotime values (3.0 twice) — exercises the
  // average-rank tie path on the dense side
  private val pt = Seq(
    ("c0", 1.0), ("c1", 2.0), ("c2", 3.0), ("c3", 3.0),
    ("c4", 5.0), ("c5", 6.0), ("c6", 7.0), ("c7", 8.0)
  ).toDF("cell", "pseudotime")

  // sparse entries; absent (cell, gene) = dense zero. gUp roughly
  // tracks pt, gDown anti-tracks, gTie has value ties, gConst is
  // constant → NaN ρ → dropped
  private val entries = Seq(
    ("c2", "gUp", 1.0), ("c4", "gUp", 2.0), ("c5", "gUp", 3.0),
    ("c6", "gUp", 4.0), ("c7", "gUp", 5.0),
    ("c0", "gDown", 5.0), ("c1", "gDown", 4.0), ("c2", "gDown", 3.0),
    ("c4", "gDown", 1.0),
    ("c0", "gTie", 2.0), ("c3", "gTie", 2.0), ("c6", "gTie", 2.0),
    ("c1", "gConst", 7.0), ("c2", "gConst", 7.0), ("c3", "gConst", 7.0),
    ("c4", "gConst", 7.0), ("c5", "gConst", 7.0), ("c6", "gConst", 7.0),
    ("c0", "gConst", 7.0), ("c7", "gConst", 7.0)
  ).toDF("cell", "gene", "x")

  private val cells = (0 to 7).map(i => s"c$i")

  private def dense(gene: String): Seq[Double] = {
    val m = entries.collect()
      .filter(_.getString(1) == gene)
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    cells.map(c => m.getOrElse(c, 0.0))
  }

  private val ptVals = Seq(1.0, 2.0, 3.0, 3.0, 5.0, 6.0, 7.0, 8.0)

  test("sparse closed-form recovery matches dense Spearman") {
    val out = SingleCell.trajectoryDynamics(entries, pt, "cell",
      "gene", "x", "pseudotime", nTopGenes = 50, minCells = 1L)
      .collect().map(r => r.getString(1) -> r).toMap
    for (g <- Seq("gUp", "gDown", "gTie")) {
      val expected = denseSpearman(ptVals, dense(g))
      val got = out(g).getDouble(2)
      assert(math.abs(got - expected) < 1e-6,
        s"$g: got $got expected $expected")
    }
    assert(out("gUp").getString(0) == "increasing")
    assert(out("gDown").getString(0) == "decreasing")
    // constant gene: zero variance → NaN ρ → dropped like the
    // reference's isfinite guard
    assert(!out.contains("gConst"))
  }

  test("direction split ranks by |rho| and caps at nTopGenes/2") {
    val out = SingleCell.trajectoryDynamics(entries, pt, "cell",
      "gene", "x", "pseudotime", nTopGenes = 2, minCells = 1L)
      .collect()
    // nTopGenes=2 → 1 per direction: strongest |ρ| each side survives
    assert(out.count(_.getString(0) == "increasing") == 1)
    assert(out.count(_.getString(0) == "decreasing") == 1)
    assert(out.forall(_.getLong(4) == 1L))
  }

  test("fewer than minCells valid cells yields an empty result") {
    val out = SingleCell.trajectoryDynamics(entries, pt, "cell",
      "gene", "x", "pseudotime", nTopGenes = 50, minCells = 100L)
    assert(out.count() == 0L)
  }
}
