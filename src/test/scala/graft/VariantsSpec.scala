package graft

import org.apache.spark.sql.functions._

import graft.operators.Variants

class VariantsSpec extends SparkSpec {
  import spark.implicits._

  // (gene, aa_change, effect, vaf, cosmic_id, cosmic_count,
  //  oncokb_effect, oncokb_level) — chrom/pos/ref/alt are key filler
  private def variant(
      gene: String, aa: String, effect: String, vaf: Double = 0.0,
      cosmicId: String = "", cosmicCount: Long = 0L,
      okbEffect: String = "", okbLevel: String = "") =
    ("chr1", 100L, "A", "T", gene, effect, aa, vaf, cosmicId,
      cosmicCount, okbEffect, okbLevel)

  private val cols = Seq("chrom", "pos", "ref", "alt", "gene",
    "effect", "aa_change", "vaf", "cosmic_id", "cosmic_count",
    "oncokb_effect", "oncokb_level")

  private def annotate(rows: Seq[(String, Long, String, String,
      String, String, String, Double, String, Long, String, String)]) =
    Variants.annotate(rows.toDF(cols: _*))
      .collect().map(r => (r.getAs[String]("aa_change"),
        r.getAs[String]("gene")) -> r).toMap

  test("hotspot panel: exact, substring and position-prefix matching") {
    val m = annotate(Seq(
      variant("KRAS", "p.G12D", "missense"),    // exact panel hit
      variant("NRAS", "p.G12D", "missense"),    // same change, NRAS list
      variant("KRAS", "p.G12W", "missense"),    // position hit, wrong alt
      variant("TTN", "p.G12D", "missense"),     // gene not in panel
      variant("NPM1", "p.W288fs", "frameshift") // alt group empty, fs
    ))
    assert(m(("p.G12D", "KRAS")).getAs[Boolean]("is_hotspot"))
    assert(m(("p.G12D", "KRAS")).getAs[Long]("hotspot_count") == 100L)
    assert(m(("p.G12D", "NRAS")).getAs[Boolean]("is_hotspot"))
    assert(!m(("p.G12W", "KRAS")).getAs[Boolean]("is_hotspot"))
    assert(!m(("p.G12D", "TTN")).getAs[Boolean]("is_hotspot"))
    assert(m(("p.W288fs", "NPM1")).getAs[Boolean]("is_hotspot"))
  }

  test("del/ins fallback fires only on regex MISS (reference asymmetry)") {
    val m = annotate(Seq(
      variant("EGFR", "exon19del", "inframe_deletion"), // raw → 1000
      variant("EGFR", "exon20ins", "inframe_insertion"), // raw → 500
      variant("EGFR", "p.E746_A750del", "inframe_deletion"), // parses!
      variant("KRAS", "exon19del", "inframe_deletion") // wrong gene
    ))
    assert(m(("exon19del", "EGFR")).getAs[Long]("hotspot_count") == 1000L)
    assert(m(("exon20ins", "EGFR")).getAs[Long]("hotspot_count") == 500L)
    // p.E746_A750del regex-matches (E746), so the fallback never runs
    // and no position key matches — NOT a hotspot, like the reference
    assert(!m(("p.E746_A750del", "EGFR")).getAs[Boolean]("is_hotspot"))
    assert(!m(("exon19del", "KRAS")).getAs[Boolean]("is_hotspot"))
  }

  test("driver score assembles the reference's additive evidence") {
    val m = annotate(Seq(
      // 40 hotspot + 0.6*15 missense + 10 oncogene-activating = 59
      variant("KRAS", "p.G12D", "missense"),
      // 40 + 0.9*15 frameshift + 15 TSG-LoF = 68.5 (TP53 hotspot R175)
      variant("TP53", "p.R175H", "frameshift"),
      // synonymous TTN: 0.1*15 = 1.5, not a driver
      variant("TTN", "p.A100T", "synonymous"),
      // cosmic capped at 20: count 200 → min(20, 80) = 20; +0.6*15 = 29
      variant("MUC16", "p.A100T", "missense", cosmicId = "COSV1",
        cosmicCount = 200L),
      // oncokb Oncogenic level 1: 25 + 10 + 9 = 44
      variant("ALK", "p.A100T", "missense", okbEffect = "Oncogenic",
        okbLevel = "1")))
    val kras = m(("p.G12D", "KRAS"))
    assert(math.abs(kras.getAs[Double]("driver_score") - 59.0) < 1e-9)
    assert(kras.getAs[Boolean]("is_driver"))
    val tp53 = m(("p.R175H", "TP53"))
    assert(math.abs(tp53.getAs[Double]("driver_score") - 68.5) < 1e-9)
    assert(tp53.getAs[String]("gene_role") == "TSG")
    val ttn = m(("p.A100T", "TTN"))
    assert(math.abs(ttn.getAs[Double]("driver_score") - 1.5) < 1e-9)
    assert(!ttn.getAs[Boolean]("is_driver"))
    val muc = m(("p.A100T", "MUC16"))
    assert(math.abs(muc.getAs[Double]("driver_score") - 29.0) < 1e-9)
    val alk = m(("p.A100T", "ALK"))
    assert(math.abs(alk.getAs[Double]("driver_score") - 44.0) < 1e-9)
  }

  test("evidence trail preserves the reference's append order") {
    val m = annotate(Seq(
      variant("TP53", "p.R175H", "frameshift", vaf = 0.42,
        cosmicId = "COSV99", cosmicCount = 31L,
        okbEffect = "Oncogenic", okbLevel = "1")))
    val ev = m(("p.R175H", "TP53")).getAs[String]("evidence")
    assert(ev == "Hotspot mutation (TP53 p.R175H); COSMIC: COSV99 " +
      "(n=31); OncoKB: Oncogenic; OncoKB Level: 1; TSG (TP53) with " +
      "loss-of-function mutation; High VAF (42.0%) - likely clonal")
  }

  test("effect ladder uses first-match dict order; UTR keys are dead") {
    val m = annotate(Seq(
      // 'splice_donor_variant' hits splice_donor (0.85) not
      // splice_region (0.4)
      variant("TTN", "p.A2T", "splice_donor_variant"),
      // unknown effect → default 0.3
      variant("TTN", "p.A3T", "weird_consequence"),
      // 5_prime_UTR_variant: the ladder's '5_prime_UTR' key is
      // case-sensitive against a lowercased effect — falls to default
      variant("TTN", "p.A4T", "5_prime_UTR_variant")))
    def score(aa: String) =
      m((aa, "TTN")).getAs[Double]("driver_score")
    assert(math.abs(score("p.A2T") - 0.85 * 15) < 1e-9)
    assert(math.abs(score("p.A3T") - 0.3 * 15) < 1e-9)
    assert(math.abs(score("p.A4T") - 0.3 * 15) < 1e-9)
  }

  test("geneSummary rolls up counts and picks the max-score variant") {
    val df = Seq(
      variant("KRAS", "p.G12D", "missense"),            // 59
      variant("KRAS", "p.A100T", "synonymous"),         // 1.5
      variant("KRAS", "p.Q61K", "missense"),            // 59 (tie)
      variant("TTN", "p.A100T", "synonymous")
    ).toDF(cols: _*)
    val out = Variants.geneSummary(Variants.annotate(df))
      .collect().map(r => r.getAs[String]("gene") -> r).toMap
    val kras = out("KRAS")
    assert(kras.getAs[Long]("total_mutations") == 3L)
    assert(kras.getAs[Long]("driver_mutations") == 2L)
    assert(kras.getAs[Long]("hotspot_mutations") == 2L)
    assert(math.abs(kras.getAs[Double]("max_driver_score") - 59.0) < 1e-9)
    // documented deviation: ties break to the smallest aa_change
    assert(kras.getAs[String]("top_variant") == "p.G12D")
    assert(out("TTN").getAs[Long]("driver_mutations") == 0L)
  }

  private val dbCols = Seq("cancer_type_raw", "gene", "is_driver",
    "role_raw", "samples", "total_samples", "mutation_freq",
    "cgc_gene", "qvalue", "row_order")

  test("driverDb maps, filters, translates roles, keeps max-samples row") {
    val rows = Seq(
      // duplicate (lung, KRAS): row 2 has MORE samples and wins
      ("LUAD", "KRAS", true, "Act", 100L, 1000L, 0.1, true, 0.01, 1L),
      ("LUSC", "KRAS", true, "LoF", 300L, 1000L, 0.3, false, 0.02, 2L),
      // equal samples: FIRST in input order (row_order 3) wins
      ("BRCA", "TP53", true, "LoF", 200L, 1000L, 0.2, true, 0.01, 3L),
      ("BRCA", "TP53", true, "Act", 200L, 1000L, 0.2, false, 0.05, 4L),
      // non-driver dropped; unmapped cohort dropped; odd role→Unknown
      ("GBM", "EGFR", false, "Act", 50L, 1000L, 0.05, true, 0.2, 5L),
      ("XXX", "MYC", true, "Act", 70L, 1000L, 0.07, true, 0.3, 6L),
      ("OV", "BRCA1", true, "ambiguous", 90L, 1000L, 0.09, false, 0.1, 7L)
    ).toDF(dbCols: _*)
    val out = Variants.driverDb(rows)
      .collect()
      .map(r => (r.getAs[String]("cancer_type"), r.getAs[String]("gene")) -> r)
      .toMap
    assert(out.size == 3)
    val lung = out(("lung_cancer", "KRAS"))
    assert(lung.getAs[Long]("samples") == 300L)
    assert(lung.getAs[String]("role") == "TSG") // winner row's LoF
    val brca = out(("breast_cancer", "TP53"))
    assert(brca.getAs[String]("role") == "TSG") // first-in-input won
    assert(brca.getAs[Boolean]("cgc_gene"))
    assert(out(("ovarian_cancer", "BRCA1")).getAs[String]("role")
      == "Unknown")
  }

  test("driverDbSummary includes empty types and caps/orders top genes") {
    val rows = (1 to 12).map { i =>
      ("BRCA", s"G${"%02d".format(i)}", true, "Act", i.toLong * 10,
        1000L, i / 100.0, true, 0.01, i.toLong)
    }.toDF(dbCols: _*)
    val out = Variants.driverDbSummary(Variants.driverDb(rows))
      .collect()
      .map(r => r.getAs[String]("cancer_type") ->
        ((r.getAs[Long]("gene_count"), r.getAs[String]("top_genes"),
          r.getAs[Long]("total_genes"))))
      .toMap
    assert(out.size == 17) // every pipeline type, even empty ones
    val (gc, tg, tot) = out("breast_cancer")
    assert(gc == 12L && tot == 12L)
    // top-10 by freq desc: G12 .. G03 (G02/G01 cut)
    assert(tg == (12 to 3 by -1).map(i => s"G${"%02d".format(i)}")
      .mkString(","))
    assert(out("melanoma") == ((0L, "", 12L)))
  }
}
