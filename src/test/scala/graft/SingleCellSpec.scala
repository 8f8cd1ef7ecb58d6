package graft

import org.apache.spark.sql.functions._

import graft.operators.SingleCell

class SingleCellSpec extends SparkSpec {
  import spark.implicits._

  // 4 cells exercising each filter branch + one kept cell; duplicate
  // (cell, gene) molecule rows must coalesce before metrics
  private def matrix = Seq(
    // c1: healthy — 3 genes, 300 counts, 10% mito
    ("c1", "MT-1", 30.0), ("c1", "G2", 200.0), ("c1", "G3", 70.0),
    // c2: empty droplet — 2 genes but only 40 counts
    ("c2", "G2", 20.0), ("c2", "G3", 20.0),
    // c3: one gene only (low_genes), counts fine — split across two
    // molecule rows to exercise the coalescing pre-aggregate
    ("c3", "G2", 100.0), ("c3", "G2", 150.0),
    // c4: high mito — 3 genes, 250 counts, 60% mito
    ("c4", "MT-1", 150.0), ("c4", "G2", 50.0), ("c4", "G3", 50.0),
    // c5: too many genes (4 >= maxGenes)
    ("c5", "G2", 50.0), ("c5", "G3", 50.0), ("c5", "G4", 50.0),
    ("c5", "G5", 50.0)
  ).toDF("cell", "gene", "cnt")

  private val thresholds = SingleCell.QcThresholds(
    minCounts = 100.0, minGenes = 2L, maxGenes = 4L, maxMitoPct = 20.0)

  test("qcMetrics coalesces molecule rows and computes per-cell QC") {
    val m = SingleCell.qcMetrics(matrix, "cell", "gene", "cnt")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("c1").getLong(1) == 3 && m("c1").getDouble(2) == 300.0)
    assert(m("c1").getDouble(3) == 10.0)
    assert(m("c3").getLong(1) == 1 && m("c3").getDouble(2) == 250.0)
    assert(m("c4").getDouble(3) == 60.0)
  }

  test("qcFilter attributes each cell to its FIRST failing filter") {
    val st = SingleCell
      .qcFilter(SingleCell.qcMetrics(matrix, "cell", "gene", "cnt"),
        thresholds)
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(st == Map(
      "c1" -> "kept", "c2" -> "empty_droplet", "c3" -> "low_genes",
      "c4" -> "high_mito", "c5" -> "high_genes"))
  }

  test("qcFilter order: a cell failing several filters counts once, first") {
    // 1 gene AND 40 counts: empty_droplet wins over low_genes,
    // matching the reference's sequential filter order
    val both = Seq(("cx", "G9", 40.0)).toDF("cell", "gene", "cnt")
    val st = SingleCell
      .qcFilter(SingleCell.qcMetrics(both, "cell", "gene", "cnt"),
        thresholds)
      .select(col("status")).as[String].collect()
    assert(st.toSeq == Seq("empty_droplet"))
  }

  test("pseudobulk densifies missing (cluster, gene) pairs to zero and CPM-scales") {
    val assigned = Seq(
      (0L, "g1", 600.0), (0L, "g2", 400.0),
      (1L, "g1", 50.0) // g2 missing from cluster 1 -> dense 0
    ).toDF("cluster", "gene", "cnt")
    val pb = SingleCell.pseudobulk(assigned, "cluster", "gene", "cnt")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r).toMap
    assert(pb.size == 4) // 2 clusters x 2 genes, dense
    assert(pb((0L, "g1")).getDouble(2) == 600.0)
    assert(pb((0L, "g1")).getDouble(3) == 600000.0) // 600/1000 * 1e6
    assert(pb((1L, "g2")).getDouble(2) == 0.0)
    assert(pb((1L, "g2")).getDouble(3) == 0.0)
    assert(pb((1L, "g1")).getDouble(3) == 1000000.0) // whole library
  }

  test("annotateClusters: position-weighted overlap, threshold, duplicate numbering") {
    // cluster 0: strong T_cells overlap at top ranks; cluster 1 the
    // same (duplicate -> suffix _2); cluster 2 below threshold
    val markers = Seq(
      (0L, "CD3D", 1L), (0L, "CD3E", 2L), (0L, "TRAC", 3L),
      (1L, "CD3E", 1L), (1L, "CD3D", 2L), (1L, "XYZ", 3L),
      (2L, "AAA", 1L), (2L, "BBB", 2L), (2L, "CD3D", 50L)
    ).toDF("cluster", "gene", "rnk")
    val sigs = Seq(
      ("T_cells", "CD3D"), ("T_cells", "CD3E"), ("T_cells", "TRAC"),
      ("B_cells", "CD79A")).toDF("cell_type", "gene")
    val out = SingleCell
      .annotateClusters(markers, "cluster", "gene", "rnk", sigs,
        listLen = 50, minScore = 1.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getString(1) == "T_cells")
    // weights (50-0)/50 + (50-1)/50 + (50-2)/50 = 2.94, x(1+0.2*3)
    assert(math.abs(out(0L).getDouble(2) - 2.94 * 1.6) < 1e-6)
    assert(out(0L).getLong(3) == 3)
    assert(out(1L).getString(1) == "T_cells_2") // duplicate numbering
    // cluster 2: its only signature gene sits at rank 50, OUTSIDE the
    // reference's top-30 matching window -> zero overlap -> Unknown
    assert(out(2L).getString(1) == "Unknown_2")
    assert(out(2L).getDouble(2) == 0.0 && out(2L).getLong(3) == 0L)
  }

  test("annotateClusters: only ranks within matchLen overlap; weights stay listLen-based") {
    // rank 30 is the last matching position (reference top_markers[:30]);
    // rank 31 must not contribute weight OR the 0.2-overlap bonus
    val markers = Seq(
      (0L, "CD3D", 30L), (0L, "CD3E", 31L)
    ).toDF("cluster", "gene", "rnk")
    val sigs = Seq(
      ("T_cells", "CD3D"), ("T_cells", "CD3E")).toDF("cell_type", "gene")
    val out = SingleCell
      .annotateClusters(markers, "cluster", "gene", "rnk", sigs,
        listLen = 50, minScore = 0.1)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(3) == 1L) // CD3D only
    // weight (50-29)/50 = 0.42, x(1 + 0.2*1)
    assert(math.abs(out.head.getDouble(2) - 0.42 * 1.2) < 1e-6)
    assert(out.head.getString(1) == "T_cells")
  }

  test("hvg ranks high-dispersion genes first and exploits sparsity for zeros") {
    // 4 cells; gHi swings 10..400 (high variance/mean), gLo constant,
    // gSparse appears in ONLY two cells — its missing entries must
    // count as expression 0 in the dense-universe moments
    val m = Seq(
      ("c1", "gHi", 10.0), ("c2", "gHi", 400.0), ("c3", "gHi", 10.0),
      ("c4", "gHi", 400.0),
      ("c1", "gLo", 100.0), ("c2", "gLo", 100.0), ("c3", "gLo", 100.0),
      ("c4", "gLo", 100.0),
      ("c1", "gSparse", 300.0), ("c3", "gSparse", 300.0)
    ).toDF("cell", "gene", "cnt")
    val out = SingleCell.hvg(m, "cell", "gene", "cnt", nBins = 1, topN = 3)
      .collect()
    val byGene = out.map(r => r.getString(0) -> r).toMap
    // single bin -> plain z-score of dispersion. The on/off sparse
    // gene leads: its dense-universe expression is {hi, 0, hi, 0} —
    // the two IMPLICIT zeros give it the largest variance/mean, which
    // is exactly the sparsity-exploiting moment arithmetic under test
    // (per-present-row moments would score it near-constant instead)
    assert(out.head.getString(0) == "gSparse" && out.head.getLong(4) == 1L)
    assert(byGene("gSparse").getDouble(2) > byGene("gHi").getDouble(2))
    // the swinging dense gene beats the constant one
    assert(byGene("gHi").getDouble(3) > byGene("gLo").getDouble(3))
    assert(out.last.getString(0) == "gLo")
  }

  test("pseudobulk conserves mass and CPM-normalizes each cluster to 1e6") {
    val rnd = new scala.util.Random(7)
    val m = Seq.tabulate(200) { i =>
      (rnd.nextInt(3).toLong, s"g${rnd.nextInt(12)}", (rnd.nextInt(50) + 1).toDouble)
    }.toDF("cluster", "gene", "cnt")
    val inTotal = m.agg(sum(col("cnt"))).head().getDouble(0)
    val pb = SingleCell.pseudobulk(m, "cluster", "gene", "cnt")
    val outTotal = pb.agg(sum(col("pb_count"))).head().getDouble(0)
    assert(math.abs(inTotal - outTotal) < 1e-6) // densified zeros add nothing
    pb.groupBy(col("cluster")).agg(sum(col("cpm")).as("s"))
      .collect().foreach(r =>
        assert(math.abs(r.getDouble(1) - 1e6) < 1e-2,
          s"cluster ${r.getLong(0)} cpm sums to ${r.getDouble(1)}"))
  }

  test("hvg is invariant to input partitioning (map-side moment contract)") {
    val rnd = new scala.util.Random(11)
    val m = Seq.tabulate(300) { i =>
      (s"c${rnd.nextInt(20)}", s"g${rnd.nextInt(15)}", (rnd.nextInt(40) + 1).toDouble)
    }.toDF("cell", "gene", "cnt")
    def run(parts: Int) = SingleCell
      .hvg(m.repartition(parts), "cell", "gene", "cnt", nBins = 3, topN = 15)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(run(1) == run(7))
  }

  test("annotateClusters: >=2 subtype-marker overlaps refine the winning type") {
    // cluster 0: T_cells wins AND hits both CD8 subtype markers ->
    // relabeled CD8_T; cluster 1: T_cells wins but only ONE subtype
    // marker -> keeps the parent name; the B_cells subtype panel must
    // never fire (its parent type did not win)
    val markers = Seq(
      (0L, "CD3D", 1L), (0L, "CD8A", 2L), (0L, "CD8B", 3L),
      (1L, "CD3D", 1L), (1L, "CD3E", 2L), (1L, "CD8A", 3L)
    ).toDF("cluster", "gene", "rnk")
    val sigs = Seq(
      ("T_cells", "CD3D"), ("T_cells", "CD3E"), ("T_cells", "CD8A"),
      ("B_cells", "CD79A")).toDF("cell_type", "gene")
    val subs = Seq(
      ("T_cells", "CD8_T", "CD8A"), ("T_cells", "CD8_T", "CD8B"),
      ("B_cells", "Plasma", "CD3D"), ("B_cells", "Plasma", "CD8A")
    ).toDF("cell_type", "subtype", "gene")
    val out = SingleCell
      .annotateClusters(markers, "cluster", "gene", "rnk", sigs,
        listLen = 50, minScore = 1.0, subtypes = Some(subs))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "CD8_T")
    assert(out(1L) == "T_cells")
  }

  test("annotateClusters: a cluster with zero signature overlap still annotates Unknown") {
    val markers = Seq((7L, "ZZZ", 1L)).toDF("cluster", "gene", "rnk")
    val sigs = Seq(("T_cells", "CD3D")).toDF("cell_type", "gene")
    val out = SingleCell
      .annotateClusters(markers, "cluster", "gene", "rnk", sigs)
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(1) == "Unknown_7")
    assert(out.head.getDouble(2) == 0.0 && out.head.getLong(3) == 0L)
  }

  // 6 genes: S1 (S set), M1 (G2M set), B1..B4 background, engineered
  // so each phase branch fires. With nBins=2 the bin split is
  // rank//6 — every gene but the top-mean one shares bin 0, so each
  // set's control is bin 0 minus that set (the OTHER set's gene is a
  // legitimate control, as in scanpy).
  private def ccMatrix = Seq(
    // cs: S-dominant
    ("cs", "S1", 500.0), ("cs", "M1", 1.0), ("cs", "B1", 10.0),
    ("cs", "B2", 10.0),
    // cm: G2M-dominant
    ("cm", "M1", 500.0), ("cm", "S1", 1.0), ("cm", "B1", 10.0),
    ("cm", "B2", 10.0),
    // cb: background only — both scores negative
    ("cb", "B1", 200.0), ("cb", "B2", 200.0), ("cb", "B3", 200.0),
    ("cb", "B4", 600.0)
  ).toDF("cell", "gene", "cnt")

  test("cellCycleScores calls S / G2M / G1 phases from signature-vs-control scores") {
    val out = SingleCell.cellCycleScores(ccMatrix, "cell", "gene", "cnt",
      sGenes = Seq("S1"), g2mGenes = Seq("M1"), nBins = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("cs").getString(3) == "S")
    assert(out("cs").getDouble(1) > 0.0)
    assert(out("cm").getString(3) == "G2M")
    assert(out("cm").getDouble(2) > out("cm").getDouble(1))
    assert(out("cb").getString(3) == "G1")
    assert(out("cb").getDouble(1) < 0.0 && out("cb").getDouble(2) < 0.0)
  }

  test("cellCycleScores: an empty control set yields null scores and null phase, not a silent S") {
    // 2 genes, default nBins=25 -> n_items=1 -> singleton bins: each
    // set's bin holds only the set gene itself, so controls are empty
    val tiny = Seq(("c1", "S1", 5.0), ("c1", "M1", 3.0))
      .toDF("cell", "gene", "cnt")
    val r = SingleCell.cellCycleScores(tiny, "cell", "gene", "cnt",
      sGenes = Seq("S1"), g2mGenes = Seq("M1")).collect().head
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("cellCycleScores is invariant to input partitioning") {
    val a = SingleCell.cellCycleScores(ccMatrix, "cell", "gene", "cnt",
      Seq("S1"), Seq("M1"), nBins = 2).collect().toSet
    val b = SingleCell.cellCycleScores(ccMatrix.repartition(7), "cell",
      "gene", "cnt", Seq("S1"), Seq("M1"), nBins = 2).collect().toSet
    assert(a == b)
  }

  // inferPloidy fixture, dense math by hand: 2 genes on one chrom,
  // reference = {r1, r2}. Dense semantics: a missing entry is x = 0,
  // so g1: mu=2, sd=1+1e-6 (r1 has 1, r2 has 3); g2: mu=1, sd=1+1e-6
  // (r1 MISSING -> 0, r2 has 2). Cell t1 only carries g2=4, but its
  // chrom score must still include g1's zero-z term |0-2|/sd.
  private def ploidyExpr = Seq(
    ("r1", "g1", 1.0),
    ("r2", "g1", 3.0), ("r2", "g2", 2.0),
    ("t1", "g2", 4.0)
  ).toDF("cell", "gene", "x")

  test("inferPloidy recovers dense z-scores from sparse entries and labels by percentile") {
    val types = Seq(("r1", "immune"), ("r2", "immune"), ("t1", "tumor"))
      .toDF("cell", "cell_type")
    val panel = Seq(("c1", "g1"), ("c1", "g2")).toDF("chrom", "gene")
    val refs = Seq("r1", "r2").toDF("cell")
    val out = SingleCell
      .inferPloidy(ploidyExpr, "cell", "gene", "x", types, panel, refs)
      .collect().map(r => r.getString(0) -> r).toMap
    // hand-computed: r1/r2 chrom score = (|1-2| + |0-1|)/2 / (1+1e-6)
    // = 0.999999; t1 = (|0-2| + |4-1|)/2 / (1+1e-6) = 2.499998 (6dp).
    // q75 = 1.749999, q90 = 2.199998 -> only t1 exceeds both.
    assert(math.abs(out("immune").getDouble(1) - 0.999999) < 1e-6)
    assert(math.abs(out("tumor").getDouble(1) - 2.499998) < 1e-6)
    assert(out("immune").getLong(4) == 0L && out("tumor").getLong(4) == 1L)
    assert(out("tumor").getDouble(6) == 100.0)
    assert(out("immune").getLong(5) == 2L)
  }

  test("inferPloidy keeps a panel gene with NO reference expression " +
    "(tumor-only amplification must not vanish)") {
    val types = Seq(("r1", "immune"), ("r2", "immune"), ("t1", "tumor"))
      .toDF("cell", "cell_type")
    // g3 is on the panel and in the matrix, but expressed ONLY in the
    // tumor cell: dense reference stats are mu=0, sd=1e-6, and t1's
    // |2-0|/1e-6 z dominates — exactly the signal a present-entries-
    // only gene universe would silently erase
    val panel = Seq(("c1", "g1"), ("c1", "g2"), ("c1", "g3"))
      .toDF("chrom", "gene")
    val refs = Seq("r1", "r2").toDF("cell")
    val ex = ploidyExpr.union(Seq(("t1", "g3", 2.0))
      .toDF("cell", "gene", "x"))
    val out = SingleCell
      .inferPloidy(ex, "cell", "gene", "x", types, panel, refs)
      .collect().map(r => r.getString(0) -> r).toMap
    // tumor ploidy score now carries the 2/1e-6 z term (≈ 2e6 / 3
    // genes); immune cells only gain g3's zero contribution
    assert(out("tumor").getDouble(1) > 1e5)
    assert(out("immune").getDouble(1) < 1.0)
    assert(out("tumor").getLong(4) == 1L)
  }

  test("inferPloidy is invariant to input partitioning") {
    val types = Seq(("r1", "a"), ("r2", "a"), ("t1", "b"))
      .toDF("cell", "cell_type")
    val panel = Seq(("c1", "g1"), ("c1", "g2")).toDF("chrom", "gene")
    val refs = Seq("r1", "r2").toDF("cell")
    val one = SingleCell
      .inferPloidy(ploidyExpr, "cell", "gene", "x", types, panel, refs)
      .collect().toSet
    val many = SingleCell
      .inferPloidy(ploidyExpr.repartition(5), "cell", "gene", "x",
        types, panel, refs)
      .collect().toSet
    assert(one == many)
  }

  test("signatureScores scores N sets in one pass and nulls sets below minGenes") {
    val out = SingleCell.signatureScores(ccMatrix, "cell", "gene", "cnt",
      Seq("sigS" -> Seq("S1"), "sigM" -> Seq("M1"),
        "ghost" -> Seq("NOPE1", "NOPE2")),
      nBins = 2, minGenes = 1)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    // same fixture as cellCycleScores: sigS/sigM must reproduce its
    // s_score/g2m_score exactly
    val cc = SingleCell.cellCycleScores(ccMatrix, "cell", "gene", "cnt",
      Seq("S1"), Seq("M1"), nBins = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- Seq("cs", "cm", "cb")) {
      assert(out((c, "sigS")).getDouble(2) == cc(c).getDouble(1))
      assert(out((c, "sigM")).getDouble(2) == cc(c).getDouble(2))
      // no gene of 'ghost' exists in the panel -> null, every cell
      assert(out((c, "ghost")).isNullAt(2))
    }
  }

  test("tmeComposition: per-prefix sums, summary rows, and the phenotype ladder") {
    val types = Seq(
      "T_cells_CD4", "T_cells_CD8", "NK_cells", "B_cells",
      "Fibroblasts", "Epithelial", "Epithelial", "Epithelial"
    ).zipWithIndex.map { case (t, i) => (s"c$i", t) }
      .toDF("cell", "cell_type")
    val out = SingleCell.tmeComposition(types, "cell_type",
      categories = Seq(
        // 'T_cells' twice: a type matching both prefixes counts twice,
        // exactly like the reference's summed startswith counts
        "helper" -> Seq("T_cells", "T_cells_CD4"),
        "cytotoxic" -> Seq("NK_cells")),
      immunePrefixes = Seq("T_cells", "NK_cells", "B_cells"),
      stromalPrefixes = Seq("Fibroblasts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("helper").getLong(1) == 3L) // 2 T_cells + 1 double-count
    assert(out("cytotoxic").getLong(1) == 1L)
    assert(out("immune_total").getLong(1) == 4L)
    assert(out("stromal_total").getLong(1) == 1L)
    assert(out("tumor_purity").getLong(1) == 3L)
    // immune 50% > 30 and NK present -> Hot on every row
    assert(out.values.forall(_.getString(3) == "Hot (Inflamed)"))
    assert(out("immune_total").getDouble(2) == 50.0)
  }

  test("tmeComposition phenotype: no cytotoxic type and low immune share go Altered/Cold") {
    def phenotype(types: Seq[String]): String = {
      val df = types.zipWithIndex.map { case (t, i) => (s"c$i", t) }
        .toDF("cell", "cell_type")
      SingleCell.tmeComposition(df, "cell_type", Seq("x" -> Seq("T_cells")),
        immunePrefixes = Seq("T_cells"), stromalPrefixes = Seq("Fib"))
        .collect().head.getString(3)
    }
    // 40% immune but no CD8/NK/cytotoxic type -> Immune-Altered
    assert(phenotype(Seq("T_cells", "T_cells", "Epi", "Epi", "Epi"))
      == "Immune-Altered")
    // 10% immune -> Cold
    assert(phenotype(Seq("T_cells", "Epi", "Epi", "Epi", "Epi",
      "Epi", "Epi", "Epi", "Epi", "Epi")) == "Cold (Desert)")
  }

  // grnEdges fixture: 4 cells, TF1 + targets A/B with missing entries
  // exercising every zero-tie shape (one zero, two zeros, three zeros)
  private def grnExpr = Seq(
    ("t", "c1", "TF1", 1.0), ("t", "c2", "TF1", 2.0), ("t", "c3", "TF1", 3.0),
    ("t", "c1", "A", 2.0), ("t", "c2", "A", 1.0),
    ("t", "c4", "B", 5.0)
  ).toDF("ct", "cell", "gene", "x")

  /** Brute-force dense Spearman: average-tie ranks then Pearson. */
  private def denseSpearman(a: Seq[Double], b: Seq[Double]): Double = {
    def ranks(v: Seq[Double]): Seq[Double] = v.map { x =>
      val less = v.count(_ < x); val eq = v.count(_ == x)
      less + (eq + 1.0) / 2.0
    }
    val (ra, rb) = (ranks(a), ranks(b))
    val n = a.size.toDouble
    val (ma, mb) = (ra.sum / n, rb.sum / n)
    val cov = ra.zip(rb).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val va = ra.map(x => (x - ma) * (x - ma)).sum
    val vb = rb.map(y => (y - mb) * (y - mb)).sum
    cov / math.sqrt(va * vb)
  }

  test("grnEdges reproduces brute-force dense Spearman from sparse entries") {
    val out = SingleCell.grnEdges(grnExpr, "ct", "cell", "gene", "x",
      tfs = Seq("TF1"), minCells = 1L, minStd = 0.0,
      minAbsCorr = -1.0, maxP = 1.1)
      .collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    // dense vectors over cells c1..c4 (missing = 0)
    val tf = Seq(1.0, 2.0, 3.0, 0.0)
    val a = Seq(2.0, 1.0, 0.0, 0.0)
    val b = Seq(0.0, 0.0, 0.0, 5.0)
    assert(math.abs(out("A") - denseSpearman(tf, a)) < 1e-5)
    assert(math.abs(out("B") - denseSpearman(tf, b)) < 1e-5)
  }

  test("grnEdges: minCells skips small types, zero-variance genes drop, cuts apply") {
    val expr2 = grnExpr.union(Seq(
      // type 'u': one cell -> below minCells
      ("u", "d1", "TF1", 1.0), ("u", "d1", "A", 1.0),
      // constant gene in 't': every cell carries 7.0 -> std 0 -> drops
      ("t", "c1", "C", 7.0), ("t", "c2", "C", 7.0),
      ("t", "c3", "C", 7.0), ("t", "c4", "C", 7.0)
    ).toDF("ct", "cell", "gene", "x"))
    val out = SingleCell.grnEdges(expr2, "ct", "cell", "gene", "x",
      tfs = Seq("TF1"), minCells = 2L, minStd = 0.1,
      minAbsCorr = -1.0, maxP = 1.1)
      .collect()
    assert(out.forall(_.getString(0) == "t"))
    assert(!out.exists(_.getString(2) == "C"))
    // default cuts: |corr| > 0.3 keeps only the strong TF1-B edge
    val cut = SingleCell.grnEdges(grnExpr, "ct", "cell", "gene", "x",
      tfs = Seq("TF1"), minCells = 1L, minStd = 0.0, maxP = 1.1)
      .collect()
    assert(cut.map(_.getString(2)).toSeq == Seq("B"))
    assert(cut.head.getString(5) == "repression")
  }

  test("ligandReceptor scores admissible type pairs and floors sub-minExpr means") {
    // cluster A: cells a1,a2; cluster B: cell b1. Means over ALL
    // cells of the type (missing entry = 0): L@A=3, L@B=0.05 (cut),
    // R@A=0.5, R@B=2. Background: all-type mean of type means.
    val expr = Seq(
      ("A", "a1", "L", 2.0), ("A", "a2", "L", 4.0), ("A", "a1", "R", 1.0),
      ("B", "b1", "L", 0.05), ("B", "b1", "R", 2.0)
    ).toDF("cluster", "cell", "gene", "v")
    val pairs = Seq(("L", "R", "L_R", "checkpoint", "inhibitory"))
      .toDF("ligand", "receptor", "pair_name", "category", "lr_function")
    val out = SingleCell
      .ligandReceptor(expr, "cluster", "cell", "gene", "v", pairs)
      .collect()
      .map(r => (r.getString(r.fieldIndex("source")),
        r.getString(r.fieldIndex("target"))) -> r).toMap
    // B's ligand mean 0.05 < 0.1: B never a source
    assert(out.keySet == Set("A" -> "A", "A" -> "B"))
    val aa = out("A" -> "A")
    // score = sqrt(3 * 0.5); allL = (3+0.05)/2, allR = (0.5+2)/2
    assert(math.abs(aa.getDouble(aa.fieldIndex("score")) - 1.224745) < 1e-6)
    assert(math.abs(aa.getDouble(aa.fieldIndex("specificity")) -
      1.224745 / (math.sqrt(1.525 * 1.25) + 0.01)) < 1e-5)
    val ab = out("A" -> "B")
    assert(math.abs(ab.getDouble(ab.fieldIndex("score")) -
      math.sqrt(3.0 * 2.0)) < 1e-6)
  }

  test("ploidy threshold swap point: percentile_approx tracks exact") {
    // inferPloidy pins EXACT percentile() for oracle parity and marks
    // percentile_approx as the atlas-scale substitution — this spec
    // is the swap's contract: on a ploidy-score-shaped distribution
    // (unimodal, no atoms at the threshold), the approx quantile with
    // the default accuracy lands within the labeling tolerance, so
    // substituting it shifts no cell across the q75/q90 boundaries
    // except those within ~0.1% of them.
    import spark.implicits._
    // deterministic skewed scores: i^1.5 scaled — strictly monotone,
    // 10k distinct values (no ties to hide approx error behind)
    val scores = (1 to 10000)
      .map(i => math.pow(i.toDouble, 1.5) / 1e4).toDF("s")
    val row = scores.agg(
      org.apache.spark.sql.functions.expr("percentile(s, 0.90)"),
      org.apache.spark.sql.functions.expr(
        "percentile_approx(s, 0.90, 10000)"),
      org.apache.spark.sql.functions.expr("percentile(s, 0.75)"),
      org.apache.spark.sql.functions.expr(
        "percentile_approx(s, 0.75, 10000)")).head()
    val (e90, a90, e75, a75) =
      (row.getDouble(0), row.getDouble(1), row.getDouble(2),
        row.getDouble(3))
    assert(math.abs(a90 - e90) / e90 < 1e-3,
      s"q90 approx $a90 vs exact $e90")
    assert(math.abs(a75 - e75) / e75 < 1e-3,
      s"q75 approx $a75 vs exact $e75")
  }
}
