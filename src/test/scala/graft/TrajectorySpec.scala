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

  // --- trajectoryRoot ---

  private val clusters = Seq(
    ("c0", "A"), ("c1", "A"), ("c2", "A"),
    ("c3", "B"), ("c4", "B"), ("c5", "B"), ("c6", "B")
  ).toDF("cell", "cluster")

  // CD34/KIT present in the universe, SOX2 absent → M = 2. Cluster A:
  // marker mass 12 over 3 cells × 2 markers = 2.0; B: 4 over 4×2 = 0.5
  private val stemExpr = Seq(
    ("c0", "CD34", 6.0), ("c1", "KIT", 6.0),
    ("c3", "CD34", 4.0),
    ("c0", "G9", 99.0), ("c5", "G9", 99.0) // non-marker noise
  ).toDF("cell", "gene", "x")

  private val coords = Seq(
    ("c0", 0.0, 0.0), ("c1", 4.0, 0.0), ("c2", 2.1, 0.0),
    ("c3", 0.0, 1.0), ("c4", 0.0, 2.0), ("c5", 0.0, 3.0),
    ("c6", 0.0, 4.0)
  ).toDF("cell", "cx", "cy")

  test("trajectoryRoot: dense marker mean, present-marker subset, " +
    "centroid root cell") {
    val out = SingleCell.trajectoryRoot(stemExpr, clusters, coords,
      "cell", "gene", "x", "cluster", "cx", "cy",
      Seq("CD34", "KIT", "SOX2"))
      .collect().map(r => r.getString(0) -> r).toMap
    // A: (6+6) / (3 cells × 2 present markers) = 2.0
    assert(math.abs(out("A").getDouble(1) - 2.0) < 1e-9)
    // B: 4 / (4 × 2) = 0.5
    assert(math.abs(out("B").getDouble(1) - 0.5) < 1e-9)
    assert(out("A").getLong(2) == 1L && out("B").getLong(2) == 2L)
    // A's centroid is (2.0333.., 0): c2 at x=2.1 is nearest
    assert(out("A").getString(3) == "c2")
    assert(out("B").isNullAt(3))
  }

  test("trajectoryRoot: no present markers yields an empty result") {
    val out = SingleCell.trajectoryRoot(stemExpr, clusters, coords,
      "cell", "gene", "x", "cluster", "cx", "cy", Seq("SOX2"))
    assert(out.count() == 0L)
  }

  test("trajectoryDynamics is invariant to input partitioning") {
    val rnd = new scala.util.Random(23)
    val cells2 = (0 until 40).map(i => s"c$i")
    val pt2 = cells2.map(c => (c, rnd.nextInt(12).toDouble))
      .toDF("cell", "pseudotime")
    val ex2 = Seq.tabulate(300) { _ =>
      (cells2(rnd.nextInt(40)), s"g${rnd.nextInt(8)}",
        (rnd.nextInt(30) + 1).toDouble)
    }.toDF("cell", "gene", "x").distinct()
    def run(parts: Int) = SingleCell.trajectoryDynamics(
      ex2.repartition(parts), pt2.repartition(parts), "cell", "gene",
      "x", "pseudotime", nTopGenes = 8, minCells = 1L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getDouble(3), r.getLong(4))).toSeq.sorted
    assert(run(1) == run(7))
  }
}
