package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integrated multi-omics driver-gene scoring — the Spark-native
  * re-expression of the reference's final rnaseq-pipeline integration
  * stage (reference: rnaseq_pipeline/agents/singlecell/
  * agent_integrated_driver.py — gene-profile merge at :438
  * _build_gene_profiles, additive evidence score at :533
  * _calculate_integrated_score, role consistency at :524
  * _check_role_consistency, hotspot validation at :338
  * _validate_hotspot, COSMIC gate at :425 _validate_gene_cosmic,
  * classification thresholds at :116-119, analysis loop + validation
  * ladder at :633 _analyze_drivers).
  *
  * Out of scope: the DGIdb network client (:381 — an HTTP call, not
  * an analytic; the curated ACTIONABLE_TARGETS fallback at :207 is
  * exactly the path the reference takes when the client is absent,
  * and is what this operator implements) and matplotlib figures
  * (:793).
  *
  * Deliberate deviations, both deterministic re-expressions of
  * iteration-order-dependent reference behavior: `hotspot_variant`
  * takes the lexicographic MAX amino-acid change among a gene's
  * hotspot driver rows (the reference keeps whichever row iterates
  * last, :513); evidence lists join to one '; '-separated string and
  * validation_sources to a ','-joined string (the reference emits
  * Python lists).
  *
  * Scale: every input is a PER-GENE aggregate frame (genome-bounded,
  * ~20k rows in production), so the whole operator is a chain of
  * gene-keyed outer joins over frames Spark will broadcast, followed
  * by per-row codegen'd scoring; the curated panels (COSMIC Tier 1,
  * validated hotspots, actionable targets) ride along as literal
  * array/map expressions evaluated per row — no join, no shuffle, no
  * broadcast for any panel. At 100 TB the cost is the upstream
  * aggregations that produce the inputs; this stage is genome-scale.
  */
object IntegratedDriver {

  /** COSMIC Tier 1 validated cancer genes
    * (agent_integrated_driver.py:232).
    */
  val cosmicTier1: Seq[String] = Seq(
    "TP53", "KRAS", "EGFR", "PIK3CA", "BRAF", "PTEN", "APC", "RB1",
    "BRCA1", "BRCA2", "MYC", "ERBB2", "CDK4", "MDM2", "CCND1",
    "CDKN2A", "ATM", "AKT1", "NRAS", "HRAS", "FGFR1", "FGFR2",
    "FGFR3", "MET", "ALK", "ROS1", "RET", "KIT", "PDGFRA", "ABL1",
    "JAK2", "BCL2", "VHL", "NF1", "NF2", "WT1", "SMAD4", "CTNNB1",
    "IDH1", "IDH2")

  /** Curated validated hotspots flattened to (gene, key, source,
    * level, keyLetter, keyDigits) rows in the reference's dict order
    * (agent_integrated_driver.py:139 VALIDATED_HOTSPOTS) — order
    * matters because the position-based fallback (:368) scans keys in
    * order and the FIRST position match wins; `filter` + first
    * element over this literal array replays that scan exactly. The
    * letter/digit legs of each key are precomputed at build time
    * (they are constants) so the per-row work is string equality
    * only.
    */
  val validatedHotspots
      : Seq[(String, String, String, String, String, String)] = {
    def row(g: String, k: String, src: String, lvl: String) = {
      val m = "^([A-Z])([0-9]+)".r.findFirstMatchIn(k)
      (g, k, src, lvl, m.map(_.group(1)).getOrElse(""),
        m.map(_.group(2)).getOrElse(""))
    }
    Seq(
      row("KRAS", "G12C", "COSMIC/OncoKB", "1"),
      row("KRAS", "G12D", "COSMIC/OncoKB", "1"),
      row("KRAS", "G12V", "COSMIC/OncoKB", "1"),
      row("KRAS", "G12A", "COSMIC", "2"),
      row("KRAS", "G12R", "COSMIC", "2"),
      row("KRAS", "G13D", "COSMIC/OncoKB", "1"),
      row("KRAS", "Q61H", "COSMIC", "2"),
      row("KRAS", "Q61K", "COSMIC", "2"),
      row("KRAS", "Q61L", "COSMIC", "2"),
      row("BRAF", "V600E", "COSMIC/OncoKB/FDA", "1"),
      row("BRAF", "V600K", "COSMIC/OncoKB", "1"),
      row("BRAF", "V600D", "COSMIC", "2"),
      row("EGFR", "L858R", "COSMIC/OncoKB/FDA", "1"),
      row("EGFR", "T790M", "COSMIC/OncoKB/FDA", "1"),
      row("EGFR", "C797S", "COSMIC/OncoKB", "2"),
      row("EGFR", "exon19del", "COSMIC/OncoKB/FDA", "1"),
      row("EGFR", "exon20ins", "COSMIC/OncoKB", "2"),
      row("PIK3CA", "E542K", "COSMIC/OncoKB", "1"),
      row("PIK3CA", "E545K", "COSMIC/OncoKB/FDA", "1"),
      row("PIK3CA", "E545Q", "COSMIC", "2"),
      row("PIK3CA", "H1047R", "COSMIC/OncoKB/FDA", "1"),
      row("PIK3CA", "H1047L", "COSMIC", "2"),
      row("ERBB2", "S310F", "COSMIC/OncoKB", "2"),
      row("ERBB2", "S310Y", "COSMIC", "3"),
      row("ERBB2", "L755S", "COSMIC/OncoKB", "2"),
      row("ERBB2", "V777L", "COSMIC/OncoKB", "2"),
      row("TP53", "R175H", "COSMIC/ClinVar", "1"),
      row("TP53", "R248Q", "COSMIC/ClinVar", "1"),
      row("TP53", "R248W", "COSMIC/ClinVar", "1"),
      row("TP53", "R273C", "COSMIC/ClinVar", "1"),
      row("TP53", "R273H", "COSMIC/ClinVar", "1"),
      row("TP53", "R282W", "COSMIC/ClinVar", "1"),
      row("IDH1", "R132H", "COSMIC/OncoKB/FDA", "1"),
      row("IDH1", "R132C", "COSMIC/OncoKB", "1"),
      row("IDH2", "R140Q", "COSMIC/OncoKB/FDA", "1"),
      row("IDH2", "R172K", "COSMIC/OncoKB", "1"),
      row("NRAS", "G12D", "COSMIC", "2"),
      row("NRAS", "G13R", "COSMIC", "2"),
      row("NRAS", "Q61K", "COSMIC/OncoKB", "1"),
      row("NRAS", "Q61R", "COSMIC/OncoKB", "1"),
      row("AKT1", "E17K", "COSMIC/OncoKB", "2"),
      row("MET", "exon14skip", "COSMIC/OncoKB/FDA", "1"))
  }

  /** Curated drug-gene interactions — the DGIdb-unavailable fallback
    * (agent_integrated_driver.py:207 ACTIONABLE_TARGETS).
    */
  val actionableTargets: Seq[(String, Seq[String])] = Seq(
    "EGFR" -> Seq("Erlotinib", "Gefitinib", "Osimertinib", "Afatinib"),
    "BRAF" -> Seq("Vemurafenib", "Dabrafenib", "Encorafenib"),
    "ALK" -> Seq("Crizotinib", "Alectinib", "Brigatinib", "Lorlatinib"),
    "ROS1" -> Seq("Crizotinib", "Entrectinib"),
    "KRAS" -> Seq("Sotorasib (G12C)", "Adagrasib (G12C)"),
    "ERBB2" -> Seq("Trastuzumab", "Pertuzumab", "T-DM1", "Tucatinib"),
    "PIK3CA" -> Seq("Alpelisib"),
    "BRCA1" -> Seq("Olaparib", "Rucaparib", "Niraparib"),
    "BRCA2" -> Seq("Olaparib", "Rucaparib", "Niraparib"),
    "MET" -> Seq("Capmatinib", "Tepotinib", "Crizotinib"),
    "RET" -> Seq("Selpercatinib", "Pralsetinib"),
    "NTRK1" -> Seq("Larotrectinib", "Entrectinib"),
    "NTRK2" -> Seq("Larotrectinib", "Entrectinib"),
    "NTRK3" -> Seq("Larotrectinib", "Entrectinib"),
    "FGFR2" -> Seq("Pemigatinib", "Infigratinib"),
    "IDH1" -> Seq("Ivosidenib"),
    "IDH2" -> Seq("Enasidenib"),
    "BCR-ABL1" -> Seq("Imatinib", "Dasatinib", "Nilotinib",
      "Ponatinib"),
    "FLT3" -> Seq("Midostaurin", "Gilteritinib"),
    "KIT" -> Seq("Imatinib", "Sunitinib", "Regorafenib"),
    "PDGFRA" -> Seq("Imatinib", "Avapritinib"))

  private def r6(c: Column): Column = round(c + lit(1e-9), 6)

  /** Merge the four per-gene evidence frames and score/classify each
    * gene with the reference's additive ladder. Expected inputs:
    *
    *  - `deg`: (gene_symbol, log2fc, padj) — significant DEGs
    *    (deg_significant.csv analog; direction derives from the
    *    log2fc sign exactly as the reference's default at :445)
    *  - `hub`: (gene_symbol, hub_score) — network hub genes
    *  - `drivers`: (gene, aa_change, is_hotspot, driver_score, vaf,
    *    is_driver) — ANNOTATED variant rows with the driver flag
    *    (driver_mutations.csv analog). The flag is consumed via
    *    conditional aggregation rather than a pre-filter on purpose:
    *    a `where(is_driver)` ahead of this operator is a predicate
    *    over the whole upstream scoring tree, and Catalyst pushes it
    *    below any upstream distinct/aggregate onto the raw scan —
    *    measured 58 s vs 2 s at sf0.1 for the demo binding. The
    *    conditional aggregate keeps the scoring tree evaluated once
    *    per VARIANT row, never per fact row.
    *  - `mutSummary`: (gene, total_mutations) — per-gene mutation
    *    counts (mutation_summary.csv analog; fills has_mutation for
    *    genes without driver rows, :503)
    *
    * Output: one row per gene with min(100, score) >= minScore,
    * UNORDERED (callers order; the reference sorts by score desc).
    */
  def integrate(
      deg: DataFrame, hub: DataFrame, drivers: DataFrame,
      mutSummary: DataFrame, minScore: Double = 20.0): DataFrame = {
    // profile assembly (:438): expression rows, then hub flags, then
    // driver-mutation aggregates, then the summary fallback — genes
    // uppercase, ENSG ids and empties dropped like the reference
    val degp = deg
      .where(col("gene_symbol") =!= "" &&
        !col("gene_symbol").startsWith("ENSG"))
      .select(upper(col("gene_symbol")).as("gene"),
        lit(true).as("has_expr"), col("log2fc"), col("padj"))
    val hubp = hub
      .where(col("gene_symbol") =!= "" &&
        !col("gene_symbol").startsWith("ENSG"))
      .select(upper(col("gene_symbol")).as("gene"),
        lit(true).as("is_hub"), col("hub_score"))
    val mutp = drivers.where(col("gene") =!= "")
      .groupBy(upper(col("gene")).as("gene"))
      .agg(count(when(col("is_driver"), lit(1))).cast("long")
          .as("dm_count"),
        max(when(col("is_driver"), col("is_hotspot")))
          .as("dm_hotspot"),
        max(when(col("is_driver") && col("is_hotspot"),
          col("aa_change"))).as("dm_hotspot_variant"),
        max(when(col("is_driver"), col("driver_score")))
          .as("dm_score"),
        max(when(col("is_driver"), col("vaf"))).as("dm_vaf"))
      .where(col("dm_count") > 0L)
      .withColumn("dm_has", lit(true))
    val sump = mutSummary.where(col("gene") =!= "")
      .groupBy(upper(col("gene")).as("gene"))
      .agg(max(col("total_mutations")).cast("long").as("sm_count"))

    val prof = degp
      .join(hubp, Seq("gene"), "full")
      .join(mutp, Seq("gene"), "full")
      .join(sump, Seq("gene"), "full")

    // STAGED projections, deliberately: each stage names its results
    // so later stages reference ATTRIBUTES, not inlined copies of the
    // producing expression — building the whole ladder as one nested
    // Column tree duplicates the panel-literal scans into every
    // consumer and blows the analyzed plan up (measured: 65 s vs
    // ~2 s at sf0.1 for the same semantics)
    val c1 = prof.select(col("gene"),
      coalesce(col("has_expr"), lit(false)).as("hasx"),
      coalesce(col("is_hub"), lit(false)).as("hub_f"),
      coalesce(col("dm_has"), col("sm_count") > 0L, lit(false))
        .as("hasm"),
      coalesce(col("dm_count"), col("sm_count"), lit(0L)).as("mcnt"),
      coalesce(col("dm_hotspot"), lit(false)).as("hot_f"),
      coalesce(col("dm_hotspot_variant"), lit("")).as("hot_var"),
      coalesce(col("dm_score"), lit(0.0)).as("mscore"),
      coalesce(col("dm_vaf"), lit(0.0)).as("mvaf"),
      coalesce(col("log2fc"), lit(0.0)).as("lfcv"),
      coalesce(col("padj"), lit(1.0)).as("padjv"),
      coalesce(col("hub_score"), lit(0.0)).as("hscore"))

    // gene role + direction (:516/:445; rosters shared verbatim with
    // agent_variant — Variants.tsgGenes/oncogenes cite both)
    val c2 = c1.select(col("*"),
      when(col("hasx"), when(col("lfcv") > 0, "up").otherwise("down"))
        .otherwise(lit("")).as("dirn"),
      when(col("gene").isin(Variants.tsgGenes: _*), "TSG")
        .when(col("gene").isin(Variants.oncogenes: _*), "Oncogene")
        .otherwise("Unknown").as("grole"))
    val c3 = c2.select(col("*"),
      when(col("grole") === "Oncogene", col("dirn") === "up")
        .when(col("grole") === "TSG", col("dirn") === "down")
        .otherwise(lit(true)).as("consistent"))

    // additive evidence score in the reference's accumulation order
    // (:533): mutation <= 50 (30 from driver score + 15 hotspot + 5
    // clonal VAF), expression <= 30 (15 magnitude + 10 significance
    // + 5 role consistency), network <= 15, multi-omic +10
    val c4 = c3.select(col("*"), (
      when(col("hasm"), least(lit(30.0), col("mscore") * 0.5))
        .otherwise(0.0) +
      when(col("hasm") && col("hot_f"), 15.0).otherwise(0.0) +
      when(col("hasm") && col("mvaf") >= 0.3, 5.0).otherwise(0.0) +
      when(col("hasx"),
        when(abs(col("lfcv")) > 2, 15.0)
          .when(abs(col("lfcv")) > 1.5, 12.0)
          .when(abs(col("lfcv")) > 1, 8.0).otherwise(0.0))
        .otherwise(0.0) +
      when(col("hasx"),
        when(col("padjv") < 0.001, 10.0)
          .when(col("padjv") < 0.01, 7.0)
          .when(col("padjv") < 0.05, 4.0).otherwise(0.0))
        .otherwise(0.0) +
      when(col("hasx") && col("consistent") &&
        col("grole") =!= "Unknown", 5.0).otherwise(0.0) +
      when(col("hub_f"), least(lit(15.0), col("hscore") * 25.0))
        .otherwise(0.0) +
      when(col("hasm") && col("hasx"), 10.0).otherwise(0.0))
      .as("raw"))

    // hotspot validation (:338): strip 'p.', exact key match first,
    // else first position match (letter+digits) in dict order
    val c5 = c4.select(col("*"),
      trim(replace(col("hot_var"), lit("p."), lit(""))).as("vcl"),
      (col("hot_f") && col("hot_var") =!= "").as("attempted"))
    val c6 = c5.select(col("*"),
      regexp_extract(col("vcl"), "^([A-Z])([0-9]+)", 1).as("vlx"),
      regexp_extract(col("vcl"), "^([A-Z])([0-9]+)", 2).as("vdx"))
    val panel = typedlit(validatedHotspots)
    val c7 = c6.select(col("*"),
      filter(panel, r =>
        col("gene") === r.getField("_1") &&
          r.getField("_2") === col("vcl")).as("ex_arr"),
      filter(panel, r =>
        col("gene") === r.getField("_1") &&
          r.getField("_5") =!= "" && col("vlx") =!= "" &&
          r.getField("_5") === col("vlx") &&
          r.getField("_6") === col("vdx")).as("pos_arr"))
    val c8 = c7.select(col("*"),
      when(size(col("ex_arr")) > 0, element_at(col("ex_arr"), 1))
        .when(size(col("pos_arr")) > 0,
          element_at(col("pos_arr"), 1)).as("chosen"))
    val drugsFull = typedlit(actionableTargets
      .map { case (g, ds) => g -> ds.mkString(", ") }.toMap)
    val drugsTop3 = typedlit(actionableTargets
      .map { case (g, ds) => g -> ds.take(3).mkString(", ") }.toMap)
    val c9 = c8.select(col("*"),
      (col("attempted") && col("chosen").isNotNull).as("hv"),
      col("gene").isin(cosmicTier1: _*).as("cosmic"),
      // classification on the RAW sum (the reference caps at 100
      // only on return, :631)
      when(col("raw") >= 80.0,
        when(col("hasm") && col("hasx"), "confirmed_driver")
          .otherwise("high_confidence"))
        .when(col("raw") >= 60.0, "high_confidence")
        .when(col("raw") >= 40.0, "candidate")
        .when(col("hasm"), "mutation_only")
        .when(col("hasx"), "expression_only")
        .otherwise("insufficient_evidence").as("class0"),
      coalesce(element_at(drugsFull, col("gene")), lit(""))
        .as("drugs_full"),
      coalesce(element_at(drugsTop3, col("gene")), lit(""))
        .as("drugs_top3"))
    val c10 = c9.select(col("*"),
      when(col("hv"), col("chosen").getField("_3")).otherwise("")
        .as("vsource"),
      when(col("hv"), col("chosen").getField("_4")).otherwise("")
        .as("vlevel"),
      (col("hv") || col("cosmic")).as("dbv"),
      (col("class0") === "confirmed_driver" &&
        !(col("hv") || col("cosmic"))).as("downgraded"),
      r6(least(lit(100.0), col("raw"))).as("score"))

    val failNote = concat(lit("⚠️ Hotspot "), col("hot_var"),
      lit(" not found in COSMIC/OncoKB validated list"))
    val evidence = concat_ws("; ",
      when(col("hasm"),
        concat(lit("Driver mutation detected (score: "),
          round(col("mscore") + lit(1e-9), 0).cast("long")
            .cast("string"), lit(")"))),
      when(col("hasm") && col("hot_f"),
        concat(lit("Hotspot mutation: "), col("hot_var"))),
      when(col("hasm") && col("mvaf") >= 0.3, concat(
        lit("High VAF ("),
        format_string("%.1f",
          round(col("mvaf") * 100.0 + lit(1e-9), 1)),
        lit("%) - likely clonal"))),
      when(col("hasx"), concat(
        lit("Differential expression: log2FC="),
        format_string("%.2f", round(col("lfcv") + lit(1e-9), 2)),
        lit(", padj="), format_string("%.2e", col("padjv")))),
      when(col("hasx") && col("consistent") &&
        col("grole") =!= "Unknown",
        concat(lit("Expression consistent with "), col("grole"),
          lit(" role ("), col("dirn"), lit(")"))),
      when(col("hub_f"), concat(lit("Network hub gene (score: "),
        format_string("%.2f", round(col("hscore") + lit(1e-9), 2)),
        lit(")"))),
      when(col("hasm") && col("hasx"),
        lit("Multi-omic evidence (mutation + expression)")),
      when(col("hv"), concat(lit("✓ Hotspot validated: "),
        col("vsource"), lit(" (Level "), col("vlevel"), lit(")"))),
      when(col("attempted") && !col("hv"), failNote),
      when(col("cosmic"), lit("✓ COSMIC Tier1 cancer gene")),
      when(col("drugs_full") =!= "", concat(
        lit("△ Curated drugs (not DGIdb validated): "),
        col("drugs_top3"))),
      when(col("downgraded"), lit("⚠️ Downgraded to " +
        "high_confidence: external validation required for " +
        "confirmed_driver")))
    val notes = trim(concat(
      when(col("attempted") && !col("hv"), failNote)
        .otherwise(lit("")),
      when(col("downgraded"),
        lit(" Classification downgraded: no external DB validation"))
        .otherwise(lit(""))))

    c10.select(
      col("gene").as("gene_symbol"),
      when(col("downgraded"), "high_confidence")
        .otherwise(col("class0")).as("classification"),
      col("score").as("confidence_score"),
      col("hasm").as("has_mutation"),
      col("mcnt").as("mutation_count"),
      col("hot_f").as("is_hotspot"),
      col("hot_var").as("hotspot_variant"),
      r6(col("mscore")).as("mutation_driver_score"),
      r6(col("mvaf")).as("mutation_vaf"),
      col("hasx").as("has_expression_change"),
      r6(col("lfcv")).as("log2fc"),
      r6(col("padjv")).as("padj"),
      col("dirn").as("direction"),
      col("hub_f").as("is_hub_gene"),
      r6(col("hscore")).as("hub_score"),
      col("grole").as("gene_role"),
      col("consistent").as("role_consistent"),
      when(col("cosmic"), "Tier1").otherwise("").as("cosmic_tier"),
      col("vlevel").as("oncokb_level"),
      col("dbv").as("db_validated"),
      col("hv").as("hotspot_validated"),
      when(col("hv"), col("vsource"))
        .when(col("cosmic"), lit("COSMIC_Tier1"))
        .otherwise(lit("")).as("validation_sources"),
      notes.as("validation_notes"),
      (col("drugs_full") =!= "").as("is_actionable"),
      col("drugs_full").as("actionable_drugs"),
      evidence.as("evidence"))
      .where(col("confidence_score") >= minScore)
  }
}
