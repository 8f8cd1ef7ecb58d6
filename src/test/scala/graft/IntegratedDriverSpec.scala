package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.IntegratedDriver

/** Contract spec for the integrated multi-omics driver stage
  * (agent_integrated_driver.py analog) on hand-built frames —
  * exercises the branches the oracle binding cannot deterministically
  * reach: the position-prefix hotspot fallback, the confirmed→high
  * downgrade without DB validation, summary-only mutation evidence,
  * and the hub-score cap.
  */
class IntegratedDriverSpec extends SparkSpec {
  import spark.implicits._

  private def deg(rows: (String, Double, Double)*) =
    rows.toSeq.toDF("gene_symbol", "log2fc", "padj")
  private def hub(rows: (String, Double)*) =
    rows.toSeq.toDF("gene_symbol", "hub_score")
  private def drv(rows: (String, String, Boolean, Double, Double,
      Boolean)*) =
    rows.toSeq.toDF("gene", "aa_change", "is_hotspot", "driver_score",
      "vaf", "is_driver")
  private def sum0(rows: (String, Long)*) =
    rows.toSeq.toDF("gene", "total_mutations")

  private def run(degF: org.apache.spark.sql.DataFrame,
      hubF: org.apache.spark.sql.DataFrame,
      drvF: org.apache.spark.sql.DataFrame,
      sumF: org.apache.spark.sql.DataFrame,
      minScore: Double = 20.0): Map[String, Row] =
    IntegratedDriver.integrate(degF, hubF, drvF, sumF, minScore)
      .collect().map(r => r.getAs[String]("gene_symbol") -> r).toMap

  test("position-prefix hotspot fallback picks the first panel key " +
    "in dict order") {
    // KRAS G12S is a Variants-panel hotspot but has NO exact key in
    // VALIDATED_HOTSPOTS — the position scan must land on G12C (the
    // first G12 entry) and carry its source/level
    val m = run(deg(), hub(),
      drv(("KRAS", "p.G12S", true, 90.0, 0.5, true)),
      sum0(("KRAS", 1L)))
    val r = m("KRAS")
    assert(r.getAs[Boolean]("hotspot_validated"))
    assert(r.getAs[String]("validation_sources") == "COSMIC/OncoKB")
    assert(r.getAs[String]("oncokb_level") == "1")
    assert(r.getAs[String]("evidence")
      .contains("✓ Hotspot validated: COSMIC/OncoKB (Level 1)"))
  }

  test("exact hotspot key wins over an earlier position match") {
    // PIK3CA E545Q: the E545 position scan lands on E545K
    // (COSMIC/OncoKB/FDA, level 1) first, but the exact E545Q key
    // (COSMIC, level 2) must win
    val m = run(deg(), hub(),
      drv(("PIK3CA", "p.E545Q", true, 90.0, 0.5, true)),
      sum0(("PIK3CA", 1L)))
    assert(m("PIK3CA").getAs[Boolean]("hotspot_validated"))
    assert(m("PIK3CA").getAs[String]("validation_sources") == "COSMIC")
    assert(m("PIK3CA").getAs[String]("oncokb_level") == "2")
  }

  test("confirmed_driver without DB validation downgrades to " +
    "high_confidence with note + evidence") {
    // TTN: not in COSMIC Tier1, not in the validated-hotspot panel,
    // no hotspot attempted. Score: mut 30 (driver 90) + vaf 5 +
    // expr 15 + sig 10 + multi 10 + hub 15 = 85 >= 80 -> confirmed,
    // then downgraded (db_validated false)
    val m = run(
      deg(("TTN", 2.5, 0.0001)), hub(("TTN", 0.9)),
      drv(("TTN", "p.A100T", false, 90.0, 0.5, true)),
      sum0(("TTN", 1L)))
    val r = m("TTN")
    assert(r.getAs[String]("classification") == "high_confidence")
    assert(!r.getAs[Boolean]("db_validated"))
    assert(r.getAs[String]("validation_notes") ==
      "Classification downgraded: no external DB validation")
    assert(r.getAs[String]("evidence").contains("⚠️ Downgraded"))
    // hub cap: 0.9 * 25 = 22.5 capped at 15
    assert(r.getAs[Double]("hub_score") == 0.9)
    assert(r.getAs[Double]("confidence_score") == 85.0)
  }

  test("validated confirmed_driver keeps its classification") {
    // KRAS G12C: hotspot validated -> db_validated -> stays confirmed
    val m = run(
      deg(("KRAS", 2.5, 0.0001)), hub(),
      drv(("KRAS", "p.G12C", true, 90.0, 0.5, true)),
      sum0(("KRAS", 1L)))
    val r = m("KRAS")
    assert(r.getAs[String]("classification") == "confirmed_driver")
    assert(r.getAs[Boolean]("db_validated"))
    assert(r.getAs[String]("validation_notes") == "")
    // oncogene up-regulated -> role consistency bonus fired:
    // 30 + 15 + 5 + 15 + 10 + 5 + 10 = 90
    assert(r.getAs[Double]("confidence_score") == 90.0)
    assert(r.getAs[String]("actionable_drugs")
      .startsWith("Sotorasib"))
  }

  test("summary-only mutation evidence: has_mutation without driver " +
    "rows, count from the summary") {
    // EGFR: no driver rows at all, 7 total mutations; expression
    // strong -> mutation_only is impossible, expression branch +
    // multi-omic fire; mut driver score contributes 0
    val m = run(
      deg(("EGFR", -2.5, 0.0001)), hub(),
      drv(), sum0(("EGFR", 7L)))
    val r = m("EGFR")
    assert(r.getAs[Boolean]("has_mutation"))
    assert(r.getAs[Long]("mutation_count") == 7L)
    assert(r.getAs[Double]("mutation_driver_score") == 0.0)
    // 0 (mut) + 15 + 10 + 0 (role: oncogene down) + 10 = 35
    assert(r.getAs[Double]("confidence_score") == 35.0)
    assert(r.getAs[String]("evidence")
      .contains("Driver mutation detected (score: 0)"))
    assert(r.getAs[String]("classification") == "mutation_only")
  }

  test("minScore filter drops weak genes; ENSG ids are skipped") {
    val m = run(
      deg(("GAPDH", 0.1, 0.9), ("ENSG00000141510", 3.0, 0.0001)),
      hub(), drv(), sum0())
    assert(m.isEmpty)
  }

  test("r22 moment-equivalence: the shared degMoments frame yields " +
    "byte-identical DEG and hub evidence to the standalone pipelines") {
    // the one-scan moment frame (queries.IntegratedQueries.degMoments)
    // must reproduce degStats (via diffStatsFromMoments — explicit
    // moment arithmetic vs var_samp, equal after the 6dp round on
    // integral quantities) and degHub (via exact re-aggregated count
    // sums) at every shipped SF the correctness gate runs
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val d = s"/root/testdata/$sf"
      val m = graft.queries.IntegratedQueries.degMoments(spark, d)
      val degNew = graft.operators.Stats
        .diffStatsFromMoments(m, "gene", "cohort", "A", "R")
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val degOld = graft.queries.StatsQueries.degStats(spark, d)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(degNew == degOld, s"deg evidence diverged at $sf")
      val hubNew = graft.queries.StatsQueries.degHubFromCounts(
        m.groupBy(col("sample_id"), col("gene"))
          .agg(sum(col("s")).as("raw_count")))
        .collect().map(_.toSeq).toSet
      val hubOld = graft.queries.StatsQueries.degHub(spark, d)
        .collect().map(_.toSeq).toSet
      assert(hubNew == hubOld, s"hub evidence diverged at $sf")
      spark.catalog.clearCache()
    }
  }
}
