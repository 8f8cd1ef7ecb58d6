package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Somatic-variant annotation — the Spark-native re-expression of the
  * reference's rule-based driver-mutation predictor (reference:
  * rnaseq_pipeline/agents/agent_variant.py:90 VariantDatabase; curated
  * hotspot panel at :95 HOTSPOTS, oncogenic-effect weights at :179
  * ONCOGENIC_EFFECTS, effect-impact ladder at :189 EFFECT_IMPACT,
  * TSG/oncogene rosters at :209/:215; scoring at :293
  * predict_driver_status; per-gene rollup at :607 _generate_summary).
  *
  * Out of scope: VCF/MAF file parsing (:414/:518 — a format reader,
  * not an analytic; callers land variants as columns) and matplotlib
  * visualization (:653).
  *
  * Scale: `annotate` is ONE narrow projection over the variant scan —
  * the curated panels ride along as literal array/CASE expressions
  * evaluated per row (78 hotspot rows, set lookups), so there is no
  * join, no shuffle and no broadcast; at 100 TB cost is exactly one
  * pass. `geneSummary` adds the single hash aggregate the rollup
  * semantically requires (map-side partials on the gene key).
  */
object Variants {

  /** Curated oncogenic hotspots flattened to (gene, positionKey,
    * variantAa) rows (agent_variant.py:95 HOTSPOTS — dict-of-dicts
    * flattened; a variant matches if ANY row matches, which is
    * exactly the reference's scan-until-hit loop at :259). The
    * special keys (exon19del / exon20ins / ITD / exon14skip / exon9)
    * are kept verbatim: only EGFR's del/ins participate (via the
    * regex-miss fallback at :247), the rest are unreachable in the
    * reference too — position keys never substring-match a
    * `<AA><digits>` position key.
    */
  val hotspotRows: Seq[(String, String, String)] = Seq(
    "KRAS" -> ("G12" -> Seq("G12C", "G12D", "G12V", "G12A", "G12R", "G12S")),
    "KRAS" -> ("G13" -> Seq("G13D", "G13C", "G13R")),
    "KRAS" -> ("Q61" -> Seq("Q61H", "Q61K", "Q61L", "Q61R")),
    "BRAF" -> ("V600" -> Seq("V600E", "V600K", "V600D", "V600R")),
    "EGFR" -> ("L858" -> Seq("L858R")),
    "EGFR" -> ("T790" -> Seq("T790M")),
    "EGFR" -> ("C797" -> Seq("C797S")),
    "EGFR" -> ("exon19del" -> Seq("del")),
    "EGFR" -> ("exon20ins" -> Seq("ins")),
    "PIK3CA" -> ("E542" -> Seq("E542K")),
    "PIK3CA" -> ("E545" -> Seq("E545K", "E545Q")),
    "PIK3CA" -> ("H1047" -> Seq("H1047R", "H1047L")),
    "TP53" -> ("R175" -> Seq("R175H", "R175C")),
    "TP53" -> ("R248" -> Seq("R248Q", "R248W")),
    "TP53" -> ("R249" -> Seq("R249S")),
    "TP53" -> ("R273" -> Seq("R273C", "R273H")),
    "TP53" -> ("R282" -> Seq("R282W")),
    "IDH1" -> ("R132" -> Seq("R132H", "R132C", "R132G", "R132S")),
    "IDH2" -> ("R140" -> Seq("R140Q", "R140L")),
    "IDH2" -> ("R172" -> Seq("R172K", "R172M")),
    "NRAS" -> ("G12" -> Seq("G12D", "G12C", "G12V")),
    "NRAS" -> ("G13" -> Seq("G13R", "G13V")),
    "NRAS" -> ("Q61" -> Seq("Q61K", "Q61R", "Q61L", "Q61H")),
    "AKT1" -> ("E17" -> Seq("E17K")),
    "ERBB2" -> ("S310" -> Seq("S310F", "S310Y")),
    "ERBB2" -> ("L755" -> Seq("L755S")),
    "ERBB2" -> ("V777" -> Seq("V777L")),
    "MET" -> ("exon14skip" -> Seq("splice")),
    "CTNNB1" -> ("S33" -> Seq("S33C", "S33F", "S33Y")),
    "CTNNB1" -> ("S37" -> Seq("S37F", "S37C")),
    "CTNNB1" -> ("S45" -> Seq("S45F", "S45P")),
    "CTNNB1" -> ("D32" -> Seq("D32G", "D32N")),
    "SF3B1" -> ("K700" -> Seq("K700E")),
    "DNMT3A" -> ("R882" -> Seq("R882H", "R882C")),
    "NPM1" -> ("W288" -> Seq("W288fs")),
    "FLT3" -> ("ITD" -> Seq("ITD")),
    "FLT3" -> ("D835" -> Seq("D835Y", "D835V")),
    "JAK2" -> ("V617" -> Seq("V617F")),
    "CALR" -> ("exon9" -> Seq("frameshift")),
    "MPL" -> ("W515" -> Seq("W515L", "W515K"))
  ).flatMap { case (g, (pk, vs)) => vs.map(v => (g, pk, v)) }

  /** Genes carrying any hotspot entry (agent_variant.py:244 — the
    * `gene not in HOTSPOTS → (False, 0)` gate).
    */
  val hotspotGenes: Seq[String] = hotspotRows.map(_._1).distinct

  /** Genes whose panel has the exon19del / exon20ins special key —
    * the only genes the regex-miss fallback (:247-252) can fire for.
    */
  val exon19DelGenes: Seq[String] =
    hotspotRows.filter(_._2 == "exon19del").map(_._1).distinct
  val exon20InsGenes: Seq[String] =
    hotspotRows.filter(_._2 == "exon20ins").map(_._1).distinct

  /** OncoKB oncogenic-effect weights (agent_variant.py:179) — exact
    * string match, absent key scores 0.
    */
  val oncogenicEffects: Seq[(String, Double)] = Seq(
    "Oncogenic" -> 1.0, "Likely Oncogenic" -> 0.8,
    "Predicted Oncogenic" -> 0.6, "Unknown" -> 0.3,
    "Likely Neutral" -> 0.1, "Inconclusive" -> 0.2)

  /** Variant-effect impact ladder (agent_variant.py:189): the FIRST
    * key (dict order) contained in the normalized effect wins —
    * normalization lowercases, so the two `_UTR` keys can never match
    * (kept verbatim: faithful to the reference's dead entries).
    * Default 0.3 for anything unmatched (:275).
    */
  val effectImpact: Seq[(String, Double)] = Seq(
    "frameshift" -> 0.9, "nonsense" -> 0.9, "stop_gained" -> 0.9,
    "splice_donor" -> 0.85, "splice_acceptor" -> 0.85,
    "start_lost" -> 0.8, "stop_lost" -> 0.7, "missense" -> 0.6,
    "inframe_insertion" -> 0.5, "inframe_deletion" -> 0.5,
    "splice_region" -> 0.4, "synonymous" -> 0.1,
    "5_prime_UTR" -> 0.2, "3_prime_UTR" -> 0.2,
    "intron" -> 0.05, "intergenic" -> 0.01)

  /** Loss-of-function effect markers (agent_variant.py:280). */
  val lofEffects: Seq[String] = Seq(
    "frameshift", "nonsense", "stop_gained", "splice_donor",
    "splice_acceptor", "start_lost")

  /** Tumor-suppressor / oncogene rosters (agent_variant.py:209,:215). */
  val tsgGenes: Seq[String] = Seq(
    "TP53", "RB1", "PTEN", "APC", "BRCA1", "BRCA2", "CDKN2A", "NF1",
    "NF2", "VHL", "STK11", "SMAD4", "ATM", "CHEK2", "CDH1", "ARID1A",
    "BAP1", "FBXW7", "MLH1", "MSH2", "MSH6", "PALB2", "SETD2",
    "SMARCA4", "WT1")
  val oncogenes: Seq[String] = Seq(
    "KRAS", "NRAS", "HRAS", "BRAF", "PIK3CA", "EGFR", "ERBB2", "MET",
    "ALK", "ROS1", "RET", "FGFR1", "FGFR2", "FGFR3", "KIT", "PDGFRA",
    "ABL1", "JAK2", "MYC", "MYCN", "CCND1", "CDK4", "CDK6", "MDM2",
    "BCL2", "CTNNB1", "IDH1", "IDH2", "FLT3", "NPM1", "DNMT3A",
    "SF3B1")

  /** The amino-acid-change parse (agent_variant.py:246
    * `re.match(r'p\.([A-Z])(\d+)([A-Z])?', aa)`) — match-at-start,
    * single-letter alt optional (so `p.W288fs` parses ref/pos with an
    * empty alt, exactly like the reference).
    */
  private val AaRx = "^p\\.([A-Z])([0-9]+)([A-Z])?"

  /** Annotate a variant table with hotspot status, driver score,
    * driver call and the reference's evidence trail. Expected input
    * columns: chrom, pos, ref, alt, gene, effect, aa_change, vaf,
    * cosmic_id, cosmic_count, oncokb_effect, oncokb_level (empty
    * string = unannotated, mirroring the dataclass defaults at :43).
    */
  def annotate(variants: DataFrame): DataFrame = {
    val aa = col("aa_change")
    val refAa = regexp_extract(aa, AaRx, 1)
    val posS = regexp_extract(aa, AaRx, 2)
    val altAa = regexp_extract(aa, AaRx, 3)
    val rxMatched = refAa =!= ""
    // position_key / full_change of agent_variant.py:255-261; when the
    // alt group is absent full_change degenerates to the position key,
    // which concat with the empty altAa reproduces
    val posKey = concat(refAa, posS)
    val fullChange = concat(refAa, posS, altAa)

    // panel scan as a literal array expression: startswith OR contains
    // on the position key collapses to contains (startswith implies
    // contains), the variant leg is exact full-change membership OR
    // substring-of-aa_change — agent_variant.py:259-267 verbatim
    val panel = typedlit(hotspotRows)
    val rxHot = exists(panel, r =>
      col("gene") === r.getField("_1") &&
        instr(posKey, r.getField("_2")) > 0 &&
        (r.getField("_3") === fullChange ||
          instr(aa, r.getField("_3")) > 0))
    // regex-miss fallback (:247-252): del → exon19del genes (count
    // 1000), else ins → exon20ins genes (count 500); both still behind
    // the gene-in-panel gate at :244
    val inPanelGene = col("gene").isin(hotspotGenes: _*)
    val delHit = inPanelGene && instr(lower(aa), "del") > 0 &&
      col("gene").isin(exon19DelGenes: _*)
    val insHit = inPanelGene && instr(lower(aa), "ins") > 0 &&
      col("gene").isin(exon20InsGenes: _*)
    val hotspotCount = when(rxMatched, when(rxHot, 100L).otherwise(0L))
      .otherwise(when(delHit, 1000L).when(insHit, 500L).otherwise(0L))
    val isHotspot = hotspotCount > 0L

    // effect-impact ladder (:268): first contained key in dict order
    val effNorm = regexp_replace(regexp_replace(lower(col("effect")),
      "_variant", ""), " ", "_")
    val impact = effectImpact.foldLeft(lit(null).cast("double")) {
      case (acc, (k, v)) => coalesce(acc,
        when(instr(effNorm, k) > 0, lit(v)))
    }
    val impactScore = coalesce(impact, lit(0.3)) * 15.0
    val isLof = lofEffects.map(l => instr(lower(col("effect")), l) > 0)
      .reduce(_ || _)
    val geneRole = when(col("gene").isin(tsgGenes: _*), "TSG")
      .when(col("gene").isin(oncogenes: _*), "Oncogene")
      .otherwise("Unknown")

    // score assembly in the reference's order (:300-337)
    val hotScore = when(isHotspot, 40.0).otherwise(0.0)
    val cosmicScore = when(col("cosmic_id") =!= "",
      least(lit(20.0), col("cosmic_count") / 50.0 * 20.0))
      .otherwise(0.0)
    val okbWeight = oncogenicEffects.foldLeft(lit(0.0)) {
      case (acc, (k, v)) =>
        when(col("oncokb_effect") === k, lit(v)).otherwise(acc)
    }
    val okbScore = when(col("oncokb_effect") =!= "",
      okbWeight * 25.0 +
        when(col("oncokb_level").isin("1", "2", "R1"), 10.0)
          .otherwise(0.0)).otherwise(0.0)
    val tsgLof = geneRole === "TSG" && isLof
    val oncoAct = geneRole === "Oncogene" &&
      lower(col("effect")) === "missense" && isHotspot
    val score = hotScore + cosmicScore + okbScore + impactScore +
      when(tsgLof, 15.0).otherwise(0.0) +
      when(oncoAct, 10.0).otherwise(0.0)

    // evidence trail, same order the reference appends (:300-335);
    // concat_ws drops the null legs
    val evidence = concat_ws("; ",
      when(isHotspot,
        concat(lit("Hotspot mutation ("), col("gene"), lit(" "), aa,
          lit(")"))),
      when(col("cosmic_id") =!= "",
        concat(lit("COSMIC: "), col("cosmic_id"), lit(" (n="),
          col("cosmic_count").cast("string"), lit(")"))),
      when(col("oncokb_effect") =!= "",
        concat(lit("OncoKB: "), col("oncokb_effect"))),
      when(col("oncokb_effect") =!= "" && col("oncokb_level") =!= "",
        concat(lit("OncoKB Level: "), col("oncokb_level"))),
      when(tsgLof,
        concat(lit("TSG ("), col("gene"),
          lit(") with loss-of-function mutation"))),
      when(oncoAct,
        concat(lit("Oncogene ("), col("gene"),
          lit(") with activating hotspot"))),
      when(col("vaf") >= 0.3,
        concat(lit("High VAF ("),
          format_string("%.1f", col("vaf") * 100.0),
          lit("%) - likely clonal"))))

    variants
      .withColumn("variant_key",
        concat(col("chrom"), lit(":"), col("pos").cast("string"),
          lit(":"), col("ref"), lit(">"), col("alt")))
      .withColumn("gene_role", geneRole)
      .withColumn("is_hotspot", isHotspot)
      .withColumn("hotspot_count", hotspotCount)
      .withColumn("driver_score", least(lit(100.0), score))
      .withColumn("is_driver", score >= 50.0)
      .withColumn("evidence", evidence)
  }

  /** Per-gene mutation rollup (agent_variant.py:607
    * _generate_summary): counts, max driver score, the top variant's
    * aa change and the gene role. DEVIATION (documented): the
    * reference keeps the FIRST max-score variant in input order; this
    * keeps the lexicographically smallest aa_change among max-score
    * variants — input order is not defined for a distributed table.
    * Callers wanting cross-engine stability should pass a frame whose
    * driver_score is already rounded (the max-score row SET must
    * agree between engines for top_variant to agree).
    *
    * Scale: the per-gene max window and the rollup share the gene
    * hash partitioning — one shuffle total, partial aggregation
    * map-side; gene cardinality (~20k human genes) is trivially
    * collector-sized.
    */
  def geneSummary(annotated: DataFrame): DataFrame = {
    val byGene =
      org.apache.spark.sql.expressions.Window.partitionBy(col("gene"))
    annotated
      .filter(col("gene") =!= "")
      .withColumn("_mx", max(col("driver_score")).over(byGene))
      .groupBy(col("gene"), col("gene_role"))
      .agg(
        count(lit(1)).as("total_mutations"),
        sum(when(col("is_driver"), 1L).otherwise(0L))
          .as("driver_mutations"),
        sum(when(col("is_hotspot"), 1L).otherwise(0L))
          .as("hotspot_mutations"),
        max(col("driver_score")).as("max_driver_score"),
        min(when(col("driver_score") === col("_mx"),
          col("aa_change"))).as("top_variant"))
  }

  /** IntOGen cohort-code → pipeline cancer-type map
    * (reference: scripts/build_driver_database.py:20
    * CANCER_TYPE_MAP — the curated panel IS the spec; unmapped
    * cohorts drop, exactly like the reference's notna filter).
    */
  val cancerTypeMap: Seq[(String, String)] = Seq(
    "BRCA" -> "breast_cancer",
    "LUAD" -> "lung_cancer", "LUSC" -> "lung_cancer",
    "NSCLC" -> "lung_cancer", "SCLC" -> "lung_cancer",
    "COAD" -> "colorectal_cancer", "COADREAD" -> "colorectal_cancer",
    "READ" -> "colorectal_cancer",
    "PAAD" -> "pancreatic_cancer", "PANET" -> "pancreatic_cancer",
    "HCC" -> "liver_cancer", "LIHC" -> "liver_cancer",
    "GBM" -> "glioblastoma",
    "LGG" -> "low_grade_glioma", "HGGNOS" -> "low_grade_glioma",
    "AML" -> "blood_cancer", "ALL" -> "blood_cancer",
    "CLL" -> "blood_cancer", "PCM" -> "blood_cancer",
    "DLBCL" -> "blood_cancer", "NHL" -> "blood_cancer",
    "KIRC" -> "kidney_cancer", "KIRP" -> "kidney_cancer",
    "KICH" -> "kidney_cancer", "RCC" -> "kidney_cancer",
    "PRAD" -> "prostate_cancer",
    "OV" -> "ovarian_cancer", "OVT" -> "ovarian_cancer",
    "STAD" -> "stomach_cancer",
    "BLCA" -> "bladder_cancer",
    "THCA" -> "thyroid_cancer", "WDTC" -> "thyroid_cancer",
    "MEL" -> "melanoma", "SKCM" -> "melanoma",
    "HNSC" -> "head_neck_cancer",
    "UCEC" -> "uterine_cancer")

  /** The 17 pipeline cancer types (build_driver_database.py:93). */
  val mlCancerTypes: Seq[String] = Seq(
    "breast_cancer", "lung_cancer", "colorectal_cancer",
    "pancreatic_cancer", "liver_cancer", "glioblastoma",
    "low_grade_glioma", "blood_cancer", "kidney_cancer",
    "prostate_cancer", "ovarian_cancer", "stomach_cancer",
    "bladder_cancer", "thyroid_cancer", "melanoma",
    "head_neck_cancer", "uterine_cancer")

  /** Driver-database build (reference:
    * scripts/build_driver_database.py:113 process_intogen_data):
    * keep IS_DRIVER rows, map cohort codes onto pipeline cancer
    * types (unmapped drop), translate roles (Act → Oncogene,
    * LoF → TSG, else Unknown), and collapse duplicate
    * (cancer_type, gene) entries keeping the one with the MOST
    * samples — first-in-input wins ties, which the reference gets
    * from file order and this operator pins with an explicit
    * `row_order` column (one max(struct) aggregate, no window sort;
    * -row_order inside the struct makes lexicographic max pick the
    * earliest row among equal sample counts).
    *
    * Input long-form columns: cancer_type_raw, gene, is_driver,
    * role_raw, samples, total_samples, mutation_freq, cgc_gene,
    * qvalue, row_order.
    *
    * Scale: a narrow filter + broadcast-free map lookup behind the
    * scan, then ONE partial-aggregated groupBy on (type, gene) —
    * group count bounded by types × genes.
    */
  def driverDb(entries: DataFrame): DataFrame = {
    val typeMap = typedlit(cancerTypeMap.toMap)
    entries
      .where(col("is_driver"))
      .withColumn("cancer_type",
        element_at(typeMap, col("cancer_type_raw")))
      .where(col("cancer_type").isNotNull)
      .withColumn("role",
        when(col("role_raw") === "Act", lit("Oncogene"))
          .when(col("role_raw") === "LoF", lit("TSG"))
          .otherwise(lit("Unknown")))
      .groupBy(col("cancer_type"), col("gene"))
      .agg(max(struct(
        col("samples"), (-col("row_order")).as("nro"),
        col("total_samples"), col("mutation_freq"), col("role"),
        col("cgc_gene"), col("qvalue"))).as("w"))
      .select(col("cancer_type"), col("gene"),
        col("w.mutation_freq").as("mutation_freq"),
        col("w.samples").as("samples"),
        col("w.total_samples").as("total_samples"),
        col("w.role").as("role"),
        col("w.cgc_gene").as("cgc_gene"),
        col("w.qvalue").as("qvalue"))
  }

  /** Summary stage (build_driver_database.py:179 generate_summary):
    * per pipeline cancer type — including types with NO drivers,
    * which the reference initializes explicitly — the gene count and
    * the top-N genes by mutation frequency (gene-name tiebreak: the
    * reference's stable sort inherits file order, the same
    * insertion-order deviation the GRN family documents), plus the
    * distinct-gene total across all types. All frames here are
    * panel-scale: the literal 17-type frame and the 1-row total
    * broadcast.
    */
  def driverDbSummary(db: DataFrame, topN: Int = 10): DataFrame = {
    val spark = db.sparkSession
    import spark.implicits._
    val allTypes = mlCancerTypes.toDF("cancer_type")
    val byType = db.groupBy(col("cancer_type"))
      .agg(count(lit(1)).cast("long").as("gc"),
        concat_ws(",", slice(transform(
          sort_array(collect_list(struct(
            (-col("mutation_freq")).as("nf"), col("gene")))),
          e => e.getField("gene")), 1, topN)).as("tg"))
    val tot = db.agg(countDistinct(col("gene")).cast("long")
      .as("total_genes"))
    allTypes.join(byType, Seq("cancer_type"), "left")
      .crossJoin(broadcast(tot))
      .select(col("cancer_type"),
        coalesce(col("gc"), lit(0L)).as("gene_count"),
        coalesce(col("tg"), lit("")).as("top_genes"),
        col("total_genes"))
  }
}
