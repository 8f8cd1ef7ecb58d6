package graft

import org.apache.spark.sql.functions._

import graft.operators.SingleCell

class CnvSpec extends SparkSpec {
  import spark.implicits._

  // 2 cells, 2 chromosomes (2 genes each) + 1 unknown-chrom gene.
  // Dense matrix (zeros implicit):
  //        gA1 gA2 | gB1 gB2   (gU ignored)
  //  c1:    4   0  |  2   2
  //  c2:    0   0  |  0   6
  // gene means: gA1=2 gA2=0 gB1=1 gB2=4 ; chrA mean=1, chrB mean=2.5
  // c1: |4+0)/2 − 1| = 1, |(2+2)/2 − 2.5| = 0.5 → (1+0.5)/2 = 0.75
  // c2: |0 − 1| = 1, |3 − 2.5| = 0.5 → 0.75
  private val entries = Seq(
    ("c1", "gA1", 4.0), ("c1", "gB1", 2.0), ("c1", "gB2", 2.0),
    ("c2", "gB2", 6.0), ("c2", "gU", 9.0)
  ).toDF("cell", "gene", "x")

  private val chromMap = Seq(
    ("gA1", "chrA"), ("gA2", "chrA"), ("gB1", "chrB"), ("gB2", "chrB"),
    ("gU", "unknown")
  ).toDF("gene", "chromosome")

  test("cnvScores: dense per-chromosome deviations from sparse entries") {
    val out = SingleCell.cnvScores(entries, chromMap, "cell", "gene",
      "x", "chromosome", minMapped = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // gA2 never appears → dropped from the universe: chrA has ONE
    // present gene (gA1, mean 2): c1 |4−2|=2, c2 |0−2|=2
    // chrB: means gB1=1 gB2=4 → chrm 2.5; c1 |2−2.5|=.5, c2 |3−2.5|=.5
    assert(math.abs(out("c1") - (2.0 + 0.5) / 2) < 1e-9)
    assert(math.abs(out("c2") - (2.0 + 0.5) / 2) < 1e-9)
  }

  test("cnvScores: unknown-mapped genes excluded; minMapped guard") {
    val out = SingleCell.cnvScores(entries, chromMap, "cell", "gene",
      "x", "chromosome", minMapped = 10)
    assert(out.count() == 0L)
  }

  private val types = Seq(
    ("c1", "Epithelial"), ("c2", "T_cells"), ("c3", "Treg")
  ).toDF("cell", "cell_type")

  test("malignantScores: weighted components and the Treg non-immune " +
    "quirk") {
    val cnv = Seq(("c1", 2.0), ("c2", 0.0), ("c3", 1.0))
      .toDF("cell", "cnv_score")
    val ex = Seq(
      ("c1", "MKI67", 3.0), ("c1", "EPCAM", 1.0), ("c3", "MKI67", 1.0),
      ("c2", "G9", 50.0)
    ).toDF("cell", "gene", "x")
    val out = SingleCell.malignantScores(cnv, ex, types, "cell",
      "gene", "x", "cell_type",
      Seq("MKI67", "EPCAM", "TOP2A"), Seq("T_cells", "Macrophage"))
      .collect().map(r => r.getString(0) -> r).toMap
    // marker means (M=2 present): c1=2, c2=0, c3=0.5
    // cnv norm: c1=1, c2=0, c3=0.5 ; marker norm: c1=1, c2=0, c3=0.25
    // c1 Epithelial: .5 + .3 + .2 = 1.0 → malignant
    // c2 T_cells (immune): 0 → not
    // c3 Treg: contains no immune substring → counts NON-immune:
    //   .25 + .075 + .2 = .525 → malignant
    assert(math.abs(out("c1").getDouble(2) - 1.0) < 1e-6)
    assert(out("c1").getBoolean(3))
    assert(math.abs(out("c2").getDouble(2) - 0.0) < 1e-6)
    assert(!out("c2").getBoolean(3))
    assert(math.abs(out("c3").getDouble(2) - 0.525) < 1e-6)
    assert(out("c3").getBoolean(3))
  }

  test("malignantScores: no present markers zeroes that component") {
    val cnv = Seq(("c1", 2.0), ("c2", 0.0)).toDF("cell", "cnv_score")
    val ex = Seq(("c1", "G9", 3.0)).toDF("cell", "gene", "x")
    val out = SingleCell.malignantScores(cnv, ex,
      types.filter(col("cell") =!= "c3"), "cell", "gene", "x",
      "cell_type", Seq("MKI67"), Seq("T_cells"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // c1 Epithelial: 0.5·1 + 0 + 0.2 = 0.7 ; c2 immune: 0
    assert(math.abs(out("c1") - 0.7) < 1e-6)
    assert(math.abs(out("c2") - 0.0) < 1e-6)
  }
}
