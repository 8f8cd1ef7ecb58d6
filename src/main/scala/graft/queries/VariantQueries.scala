package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Variants

/** Oracle bindings for the somatic-variant annotation family
  * (reference: rnaseq_pipeline/agents/agent_variant.py). The variant
  * table is synthesized deterministically from lineitem order keys —
  * every fourth variant draws a curated (gene, aa_change, effect)
  * hotspot triple so the panel-match, TSG/oncogene and evidence paths
  * all fire for real; the rest cross three independent residue-indexed
  * panels so near-misses (right gene wrong change, right change wrong
  * gene, raw `exon19del` vs parsed `p.E746_A750del`) are exercised.
  *
  * Cross-engine protocol: score arithmetic is written in the same
  * order and parenthesization on both sides (bit-identical doubles),
  * outputs round to 6dp with the +1e-9 nudge, ordering uses only
  * rounded scores plus unique keys.
  */
object VariantQueries {

  private val NVar = 400

  /** Curated driver triples for vid % 4 == 0 rows: gene, aa_change,
    * effect. The last three exercise the frameshift parse (W288fs:
    * alt group empty), and the regex-miss del/ins fallback (raw MAF
    * style `exon19del` / `exon20ins` — note `p.E746_A750del` in the
    * miss panel below parses and is NOT a hotspot, the reference's
    * own asymmetry).
    */
  private val Pairs: Seq[(String, String, String)] = Seq(
    ("KRAS", "p.G12D", "missense_variant"),
    ("BRAF", "p.V600E", "missense_variant"),
    ("EGFR", "p.L858R", "missense_variant"),
    ("EGFR", "p.T790M", "missense_variant"),
    ("PIK3CA", "p.E545K", "missense_variant"),
    ("TP53", "p.R175H", "missense_variant"),
    ("TP53", "p.R248Q", "missense_variant"),
    ("IDH1", "p.R132H", "missense_variant"),
    ("NRAS", "p.Q61K", "missense_variant"),
    ("JAK2", "p.V617F", "missense_variant"),
    ("DNMT3A", "p.R882H", "missense_variant"),
    ("ERBB2", "p.S310F", "missense_variant"),
    ("NPM1", "p.W288fs", "frameshift_variant"),
    ("EGFR", "exon19del", "inframe_deletion"),
    ("EGFR", "exon20ins", "inframe_insertion"))

  private val GenePanel = Seq(
    "KRAS", "BRAF", "EGFR", "TP53", "PIK3CA", "IDH1", "NRAS", "ERBB2",
    "JAK2", "DNMT3A", "PTEN", "RB1", "APC", "BRCA1", "MYC", "ALK",
    "TTN", "MUC16")
  private val AaPanel = Seq(
    "p.G12D", "p.V600E", "p.L858R", "p.T790M", "p.E545K", "p.R175H",
    "p.R132H", "p.Q61K", "p.V617F", "p.R882H", "p.A100T", "p.G500S",
    "p.E746_A750del", "p.K27M")
  private val EffectPanel = Seq(
    "missense_variant", "frameshift_variant", "stop_gained",
    "splice_donor_variant", "splice_acceptor_variant", "start_lost",
    "inframe_deletion", "synonymous_variant", "intron_variant",
    "splice_region_variant")
  private val OkbEffects = Seq(
    "", "Oncogenic", "Likely Oncogenic", "Predicted Oncogenic",
    "Unknown", "Likely Neutral", "Inconclusive")
  private val OkbLevels = Seq("", "1", "2", "3A", "3B", "4", "R1")
  private val Acgt = Seq("A", "C", "G", "T")

  /* ---------------- shared synth: Spark side ---------------- */

  // r21 note: an element_at(typedlit(items), idx+1) array lookup
  // (smaller tree than the CASE fold) measured a wash on var_* and
  // slightly worse on integrated_driver — after cached-plan
  // coalescing the 400-row projections are no longer init-bound, and
  // ANSI element_at adds bounds-check branches. CASE fold kept.
  private def pick(idx: Column, items: Seq[String]): Column =
    items.zipWithIndex.foldRight(lit("")) { case ((n, i), rest) =>
      when(idx === i, lit(n)).otherwise(rest)
    }

  private def synth(s: SparkSession, d: String): DataFrame = {
    // cached: the 400-row distinct is a PLAN BARRIER (the driverSynth
    // precedent) — without it downstream filters like geneSummary's
    // gene != '' push their panel CASE chains through the aggregate
    // onto the lineitem scan and evaluate per FACT row (seen in
    // var_summary's scan DataFilters; it benched consistently ~2×
    // var_driver, which has no pushable filter)
    val vids = Tables.lineitem(s, d)
      .select(pmod(col("l_orderkey"), lit(NVar)).cast("long").as("vid"))
      .distinct()
      .cache()
    val vid = col("vid")
    val paired = pmod(vid, lit(4)) === 0
    val pairIdx = pmod(vid / 4, lit(Pairs.size))
    // multipliers coprime to the panel sizes so every panel entry is
    // drawn (5⊥18, 11⊥14, 7⊥10)
    val geneIdx = pmod(vid * 5 + 1, lit(GenePanel.size))
    val aaIdx = pmod(vid * 11 + 2, lit(AaPanel.size))
    val effIdx = pmod(vid * 7 + 3, lit(EffectPanel.size))
    vids.select(
      vid,
      concat(lit("chr"), (pmod(vid, lit(22)) + 1).cast("string"))
        .as("chrom"),
      (vid * 1000 + 37).as("pos"),
      pick(pmod(vid, lit(4)), Acgt).as("ref"),
      pick(pmod(vid + 1, lit(4)), Acgt).as("alt"),
      when(paired, pick(pairIdx, Pairs.map(_._1)))
        .otherwise(pick(geneIdx, GenePanel)).as("gene"),
      when(paired, pick(pairIdx, Pairs.map(_._2)))
        .otherwise(pick(aaIdx, AaPanel)).as("aa_change"),
      when(paired, pick(pairIdx, Pairs.map(_._3)))
        .otherwise(pick(effIdx, EffectPanel)).as("effect"),
      (pmod(vid, lit(100)) / 100.0).as("vaf"),
      when(pmod(vid, lit(3)) === 0,
        concat(lit("COSV"), (vid + 100000).cast("string")))
        .otherwise(lit("")).as("cosmic_id"),
      when(pmod(vid, lit(3)) === 0, pmod(vid * 13, lit(120)))
        .otherwise(lit(0L)).as("cosmic_count"),
      pick(pmod(vid * 11 + 5, lit(7)), OkbEffects).as("oncokb_effect"),
      pick(pmod(vid * 13 + 1, lit(7)), OkbLevels).as("oncokb_level"))
  }

  /** The annotated variant frame (shared with IntegratedQueries —
    * the integrated-driver binding consumes the same variant pipeline
    * output the reference's driver_mutations.csv / mutation_summary
    * .csv carry).
    */
  private[queries] def annotated(s: SparkSession, d: String): DataFrame =
    Variants.annotate(synth(s, d))

  private def varDriver(s: SparkSession, d: String): DataFrame =
    Variants.annotate(synth(s, d))
      .select(col("variant_key"), col("gene"), col("aa_change"),
        col("effect"), round(col("vaf") + 1e-9, 6).as("vaf"),
        col("gene_role"), col("is_hotspot"), col("hotspot_count"),
        round(col("driver_score") + 1e-9, 6).as("driver_score"),
        col("is_driver"), col("evidence"))
      .orderBy(desc("driver_score"), col("variant_key"))

  private def varSummary(s: SparkSession, d: String): DataFrame =
    Variants.geneSummary(
      Variants.annotate(synth(s, d))
        .withColumn("driver_score",
          round(col("driver_score") + 1e-9, 6)))
      .orderBy(desc("max_driver_score"), col("gene"))

  /* ---------------- shared synth: oracle side ---------------- */

  private def sqlIn(items: Seq[String]): String =
    items.map(g => s"'$g'").mkString("(", ", ", ")")

  private def sqlCase(idxExpr: String, items: Seq[String]): String =
    items.zipWithIndex.map { case (n, i) =>
      s"WHEN $idxExpr = $i THEN '$n'"
    }.mkString("CASE ", " ", " ELSE '' END")

  /** The whole annotate chain as CTEs ending in `sc` (one row per
    * variant with score/evidence/flags) — shared by both oracles so
    * the chain cannot drift between them. Generated from the SAME
    * panel constants the operator uses.
    */
  private[queries] val annotCtes: String = {
    val hpValues = Variants.hotspotRows
      .map { case (g, pk, va) => s"('$g', '$pk', '$va')" }
      .mkString(", ")
    val impactCase = Variants.effectImpact.map { case (k, v) =>
      s"WHEN strpos(en, '$k') > 0 THEN $v"
    }.mkString("CASE ", " ", " ELSE 0.3 END")
    val okbCase = Variants.oncogenicEffects.map { case (k, v) =>
      s"WHEN oncokb_effect = '$k' THEN $v"
    }.mkString("CASE ", " ", " ELSE 0.0 END")
    val lofCond = Variants.lofEffects
      .map(l => s"strpos(le, '$l') > 0").mkString(" OR ")
    s"""vv AS (SELECT DISTINCT (l_orderkey % $NVar)::BIGINT AS vid
       |  FROM lineitem),
       |vsyn AS (SELECT vid,
       |    'chr' || ((vid % 22) + 1)::VARCHAR AS chrom,
       |    (vid * 1000 + 37)::BIGINT AS pos,
       |    ${sqlCase("vid % 4", Acgt)} AS ref,
       |    ${sqlCase("(vid + 1) % 4", Acgt)} AS alt,
       |    CASE WHEN vid % 4 = 0
       |      THEN ${sqlCase(s"(vid // 4) % ${Pairs.size}", Pairs.map(_._1))}
       |      ELSE ${sqlCase(s"(vid * 5 + 1) % ${GenePanel.size}", GenePanel)}
       |      END AS gene,
       |    CASE WHEN vid % 4 = 0
       |      THEN ${sqlCase(s"(vid // 4) % ${Pairs.size}", Pairs.map(_._2))}
       |      ELSE ${sqlCase(s"(vid * 11 + 2) % ${AaPanel.size}", AaPanel)}
       |      END AS aa_change,
       |    CASE WHEN vid % 4 = 0
       |      THEN ${sqlCase(s"(vid // 4) % ${Pairs.size}", Pairs.map(_._3))}
       |      ELSE ${sqlCase(s"(vid * 7 + 3) % ${EffectPanel.size}", EffectPanel)}
       |      END AS effect,
       |    ((vid % 100) / 100.0)::DOUBLE AS vaf,
       |    CASE WHEN vid % 3 = 0 THEN 'COSV' || (vid + 100000)::VARCHAR
       |      ELSE '' END AS cosmic_id,
       |    (CASE WHEN vid % 3 = 0 THEN (vid * 13) % 120 ELSE 0
       |      END)::BIGINT AS cosmic_count,
       |    ${sqlCase("(vid * 11 + 5) % 7", OkbEffects)} AS oncokb_effect,
       |    ${sqlCase("(vid * 13 + 1) % 7", OkbLevels)} AS oncokb_level
       |  FROM vv),
       |hp AS (SELECT * FROM (VALUES $hpValues) t(g, pk, va)),
       |rxp AS (SELECT *,
       |    regexp_extract(aa_change, '^p\\.([A-Z])([0-9]+)([A-Z])?', 1)
       |      AS ref_aa,
       |    regexp_extract(aa_change, '^p\\.([A-Z])([0-9]+)([A-Z])?', 2)
       |      AS pos_s,
       |    regexp_extract(aa_change, '^p\\.([A-Z])([0-9]+)([A-Z])?', 3)
       |      AS alt_aa
       |  FROM vsyn),
       |hx AS (SELECT rxp.*,
       |    EXISTS(SELECT 1 FROM hp WHERE hp.g = rxp.gene
       |      AND strpos(rxp.ref_aa || rxp.pos_s, hp.pk) > 0
       |      AND (hp.va = rxp.ref_aa || rxp.pos_s || rxp.alt_aa
       |           OR strpos(rxp.aa_change, hp.va) > 0)) AS rx_hot
       |  FROM rxp),
       |an AS (SELECT *,
       |    (CASE WHEN ref_aa <> ''
       |       THEN CASE WHEN rx_hot THEN 100 ELSE 0 END
       |     WHEN gene IN ${sqlIn(Variants.hotspotGenes)}
       |       AND strpos(lower(aa_change), 'del') > 0
       |       AND gene IN ${sqlIn(Variants.exon19DelGenes)} THEN 1000
       |     WHEN gene IN ${sqlIn(Variants.hotspotGenes)}
       |       AND strpos(lower(aa_change), 'ins') > 0
       |       AND gene IN ${sqlIn(Variants.exon20InsGenes)} THEN 500
       |     ELSE 0 END)::BIGINT AS hotspot_count,
       |    replace(replace(lower(effect), '_variant', ''), ' ', '_')
       |      AS en,
       |    lower(effect) AS le,
       |    CASE WHEN gene IN ${sqlIn(Variants.tsgGenes)} THEN 'TSG'
       |         WHEN gene IN ${sqlIn(Variants.oncogenes)}
       |           THEN 'Oncogene'
       |         ELSE 'Unknown' END AS gene_role
       |  FROM hx),
       |an2 AS (SELECT *,
       |    hotspot_count > 0 AS is_hotspot,
       |    $impactCase AS impact,
       |    ($lofCond) AS is_lof,
       |    $okbCase AS okbw
       |  FROM an),
       |an3 AS (SELECT *,
       |    gene_role = 'TSG' AND is_lof AS tsg_lof,
       |    gene_role = 'Oncogene' AND le = 'missense' AND is_hotspot
       |      AS onco_act
       |  FROM an2),
       |sc AS (SELECT *,
       |    CASE WHEN is_hotspot THEN 40.0 ELSE 0.0 END
       |      + CASE WHEN cosmic_id <> ''
       |          THEN least(20.0, cosmic_count / 50.0 * 20.0)
       |          ELSE 0.0 END
       |      + CASE WHEN oncokb_effect <> ''
       |          THEN okbw * 25.0
       |            + CASE WHEN oncokb_level IN ('1', '2', 'R1')
       |                THEN 10.0 ELSE 0.0 END
       |          ELSE 0.0 END
       |      + impact * 15.0
       |      + CASE WHEN tsg_lof THEN 15.0 ELSE 0.0 END
       |      + CASE WHEN onco_act THEN 10.0 ELSE 0.0 END AS score,
       |    concat_ws('; ',
       |      CASE WHEN is_hotspot THEN 'Hotspot mutation (' || gene ||
       |        ' ' || aa_change || ')' END,
       |      CASE WHEN cosmic_id <> '' THEN 'COSMIC: ' || cosmic_id ||
       |        ' (n=' || cosmic_count::VARCHAR || ')' END,
       |      CASE WHEN oncokb_effect <> ''
       |        THEN 'OncoKB: ' || oncokb_effect END,
       |      CASE WHEN oncokb_effect <> '' AND oncokb_level <> ''
       |        THEN 'OncoKB Level: ' || oncokb_level END,
       |      CASE WHEN tsg_lof THEN 'TSG (' || gene ||
       |        ') with loss-of-function mutation' END,
       |      CASE WHEN onco_act THEN 'Oncogene (' || gene ||
       |        ') with activating hotspot' END,
       |      CASE WHEN vaf >= 0.3 THEN 'High VAF (' ||
       |        printf('%.1f', vaf * 100.0) ||
       |        '%) - likely clonal' END) AS evidence
       |  FROM an3)""".stripMargin
  }

  private val varDriverSql =
    s"""WITH $annotCtes
       |SELECT chrom || ':' || pos::VARCHAR || ':' || ref || '>' || alt
       |    AS variant_key,
       |  gene, aa_change, effect,
       |  round(vaf + 0.000000001, 6) AS vaf, gene_role, is_hotspot,
       |  hotspot_count,
       |  round(least(100.0, score) + 0.000000001, 6) AS driver_score,
       |  score >= 50.0 AS is_driver, evidence
       |FROM sc
       |ORDER BY driver_score DESC, variant_key""".stripMargin

  private val varSummarySql =
    s"""WITH $annotCtes,
       |rs AS (SELECT gene, gene_role, aa_change,
       |    round(least(100.0, score) + 0.000000001, 6) AS dsc,
       |    score >= 50.0 AS is_driver, is_hotspot
       |  FROM sc WHERE gene <> ''),
       |mg AS (SELECT gene, max(dsc) AS mx FROM rs GROUP BY gene)
       |SELECT rs.gene, rs.gene_role,
       |  count(*)::BIGINT AS total_mutations,
       |  (sum(CASE WHEN is_driver THEN 1 ELSE 0 END))::BIGINT
       |    AS driver_mutations,
       |  (sum(CASE WHEN is_hotspot THEN 1 ELSE 0 END))::BIGINT
       |    AS hotspot_mutations,
       |  max(dsc) AS max_driver_score,
       |  min(CASE WHEN dsc = mg.mx THEN aa_change END) AS top_variant
       |FROM rs JOIN mg USING (gene)
       |GROUP BY rs.gene, rs.gene_role
       |ORDER BY max_driver_score DESC, gene""".stripMargin

  /* ---------------- driver_db / driver_db_summary ---------------- */

  private val DbVar = 300
  private val RawCodes: Seq[String] =
    Variants.cancerTypeMap.map(_._1) ++ Seq("XXX", "YYY")
  private val RoleRaw = Seq("Act", "LoF", "ambiguous")

  /** Long-form IntOGen-shaped synth: 300 driver-gene entries whose
    * cohort codes span all 36 mapped codes PLUS two unmapped ones
    * (the notna-drop branch), with (type, gene) collisions by
    * construction so the keep-max-samples dedup really collapses
    * rows. Multipliers coprime to the panel sizes (7⊥38, 5⊥18).
    */
  private def driverSynth(s: SparkSession, d: String): DataFrame = {
    // cached: the 300-row distinct is a PLAN BARRIER — without it
    // Catalyst pushes the downstream is_driver filter and the
    // 38-entry cohort-map lookup through the aggregate onto the
    // lineitem scan, evaluating the panel CASE chains once per FACT
    // row instead of once per vid (measured 9.1 s -> the scan cost
    // at the sf1 probe). Also de-duplicates the scan between the
    // summary query's two consumers.
    val vids = Tables.lineitem(s, d)
      .select(pmod(col("l_orderkey"), lit(DbVar)).cast("long").as("vid"))
      .distinct()
      .cache()
    val vid = col("vid")
    vids.select(
      vid.as("row_order"),
      pick(pmod(vid * 7 + 1, lit(RawCodes.size)), RawCodes)
        .as("cancer_type_raw"),
      pick(pmod(vid * 5 + 2, lit(GenePanel.size)), GenePanel).as("gene"),
      (pmod(vid, lit(3)) =!= 0).as("is_driver"),
      pick(pmod(vid * 11 + 1, lit(RoleRaw.size)), RoleRaw).as("role_raw"),
      (pmod(vid * 13, lit(500)) + 1).as("samples"),
      (lit(1000L) + pmod(vid * 17, lit(200))).as("total_samples"),
      (pmod(vid, lit(2)) === 0).as("cgc_gene"),
      (pmod(vid, lit(100)).cast("double") / 100.0).as("qvalue"))
      .withColumn("mutation_freq",
        round(col("samples").cast("double") / col("total_samples"), 6))
  }

  private def driverDbQ(s: SparkSession, d: String): DataFrame =
    Variants.driverDb(driverSynth(s, d))
      .orderBy(col("cancer_type"), desc("mutation_freq"), col("gene"))

  private def driverDbSummaryQ(s: SparkSession, d: String): DataFrame =
    Variants.driverDbSummary(Variants.driverDb(driverSynth(s, d)))
      .orderBy(col("cancer_type"))

  /** Synth + map + role + keep-max dedup as shared CTEs ending in
    * `db` — generated from the SAME panels the operator uses.
    */
  private val driverDbCtes: String = {
    val ctCase = Variants.cancerTypeMap.map { case (k, v) =>
      s"WHEN '$k' THEN '$v'"
    }.mkString("CASE ctr ", " ", " ELSE NULL END")
    s"""dv AS (SELECT DISTINCT (l_orderkey % $DbVar)::BIGINT AS vid
       |  FROM lineitem),
       |de AS (SELECT vid AS row_order,
       |    ${sqlCase(s"(vid * 7 + 1) % ${RawCodes.size}", RawCodes)} AS ctr,
       |    ${sqlCase(s"(vid * 5 + 2) % ${GenePanel.size}", GenePanel)} AS gene,
       |    (vid % 3) <> 0 AS is_driver,
       |    ${sqlCase(s"(vid * 11 + 1) % ${RoleRaw.size}", RoleRaw)} AS role_raw,
       |    ((vid * 13) % 500 + 1)::BIGINT AS samples,
       |    (1000 + (vid * 17) % 200)::BIGINT AS total_samples,
       |    (vid % 2) = 0 AS cgc_gene,
       |    (vid % 100)::DOUBLE / 100.0 AS qvalue
       |  FROM dv),
       |dm AS (SELECT row_order, gene, samples, total_samples, cgc_gene,
       |    qvalue, $ctCase AS cancer_type,
       |    round(samples::DOUBLE / total_samples, 6) AS mutation_freq,
       |    CASE role_raw WHEN 'Act' THEN 'Oncogene'
       |      WHEN 'LoF' THEN 'TSG' ELSE 'Unknown' END AS role
       |  FROM de WHERE is_driver),
       |dr AS (SELECT cancer_type, gene, mutation_freq, samples,
       |    total_samples, role, cgc_gene, qvalue,
       |    row_number() OVER (PARTITION BY cancer_type, gene
       |      ORDER BY samples DESC, row_order) AS rn
       |  FROM dm WHERE cancer_type IS NOT NULL),
       |db AS (SELECT cancer_type, gene, mutation_freq, samples,
       |    total_samples, role, cgc_gene, qvalue FROM dr WHERE rn = 1)"""
      .stripMargin
  }

  private val driverDbSql =
    s"""WITH $driverDbCtes
       |SELECT cancer_type, gene, mutation_freq, samples, total_samples,
       |  role, cgc_gene, qvalue
       |FROM db ORDER BY cancer_type, mutation_freq DESC, gene"""
      .stripMargin

  private val driverDbSummarySql = {
    val typeValues = Variants.mlCancerTypes
      .map(t => s"('$t')").mkString(", ")
    s"""WITH $driverDbCtes,
       |types(cancer_type) AS (VALUES $typeValues),
       |rk AS (SELECT cancer_type, gene,
       |    row_number() OVER (PARTITION BY cancer_type
       |      ORDER BY mutation_freq DESC, gene) AS k
       |  FROM db),
       |tg AS (SELECT cancer_type, count(*)::BIGINT AS gene_count,
       |    string_agg(CASE WHEN k <= 10 THEN gene END, ',' ORDER BY k)
       |      AS top_genes
       |  FROM rk GROUP BY cancer_type),
       |tot AS (SELECT count(DISTINCT gene)::BIGINT AS total_genes FROM db)
       |SELECT types.cancer_type,
       |  coalesce(gene_count, 0)::BIGINT AS gene_count,
       |  coalesce(top_genes, '') AS top_genes, total_genes
       |FROM types LEFT JOIN tg ON types.cancer_type = tg.cancer_type, tot
       |ORDER BY types.cancer_type""".stripMargin
  }

  val defs: Seq[Qdef] = Seq(
    Qdef("var_driver", varDriver, Some(varDriverSql)),
    Qdef("var_summary", varSummary, Some(varSummarySql)),
    Qdef("driver_db", driverDbQ, Some(driverDbSql)),
    Qdef("driver_db_summary", driverDbSummaryQ, Some(driverDbSummarySql)))
}
