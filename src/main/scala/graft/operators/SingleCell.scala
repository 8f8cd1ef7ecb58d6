package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Single-cell pipeline stages beyond marker finding (which lives in
  * Stats.markerStats): QC filtering, pseudobulk aggregation, and
  * marker-based cluster annotation — the Spark-native re-expression
  * of the data-processing stages of
  * reference: rnaseq_pipeline/agents/agent_singlecell.py.
  *
  * Scale design: a single-cell count matrix is long-form
  * (cell, gene, count) rows — at atlas scale (10⁸ cells × 2×10⁴
  * genes, ~1% density → 2×10¹⁰ nonzero rows) everything here must be
  * map-side-combinable aggregates with panel-scale (genes × clusters)
  * or cell-scale outputs, and nothing may shuffle matrix rows twice.
  * Every method below is one or two cascaded hash aggregates over the
  * matrix; windows only ever run on panel- or cluster-cardinality
  * frames.
  */
object SingleCell {

  private def r6(c: Column) = round(c + lit(1e-9), 6)

  /** QC thresholds (reference: agent_singlecell.py:424
    * min_counts_per_cell=500 empty-droplet cut, :436/:443
    * min/max_genes_per_cell, :457 max_mito_percent).
    */
  final case class QcThresholds(
      minCounts: Double = 500.0,
      minGenes: Long = 200L,
      maxGenes: Long = 6000L,
      maxMitoPct: Double = 20.0)

  /** Per-cell QC metrics (reference: agent_singlecell.py:384
    * _qc_filtering step 1.1 — sc.pp.calculate_qc_metrics:
    * n_genes_by_counts, total_counts, pct_counts_mt with the mito
    * flag from var_names.str.startswith('MT-') at :392).
    *
    * Input: long-form (cell, gene, count) rows, possibly with
    * duplicate (cell, gene) entries (raw molecule rows). Two cascaded
    * map-side-combinable aggregates: first coalesce to the sparse
    * matrix entry per (cell, gene) — that IS the count-matrix build —
    * then per-cell metrics. No count(distinct) expand, no window, no
    * join; output is one row per cell.
    *
    * Cross-engine protocol: counts are summed raw (exact when counts
    * are integral); only the mito PERCENTAGE is a ratio, rounded to
    * 6dp with the suite's +1e-9 half-boundary nudge — threshold
    * compares happen on the rounded value so both engines cut
    * identically.
    *
    * n_genes counts only POSITIVE entries (scanpy's n_genes_by_counts
    * semantics) — a sparse input carrying explicit zero rows must not
    * inflate the gene count. Mito detection takes a prefix LIST
    * (default MT-/mt-, reference :392 startswith(('MT-','mt-'))) so
    * lowercase mouse-style names are flagged too.
    */
  def qcMetrics(
      matrix: DataFrame, cellCol: String, geneCol: String,
      countCol: String,
      mitoPrefixes: Seq[String] = Seq("MT-", "mt-")): DataFrame = {
    val entry = matrix
      .groupBy(col(cellCol), col(geneCol))
      .agg(sum(col(countCol)).as("cnt"))
    val isMito = mitoPrefixes
      .map(p => col(geneCol).startsWith(p))
      .reduce(_ || _)
    entry
      .groupBy(col(cellCol))
      .agg(
        count(when(col("cnt") > 0, lit(1))).as("n_genes"),
        sum(col("cnt")).as("total_counts"),
        sum(when(isMito, col("cnt"))
          .otherwise(lit(0.0))).as("mito_counts"))
      .select(col(cellCol), col("n_genes"),
        col("total_counts"),
        r6(col("mito_counts") * lit(100.0) / col("total_counts"))
          .as("pct_mt"))
  }

  /** QC filter with audit attribution (reference:
    * agent_singlecell.py:420-466 — the sequential empty-droplet,
    * min-genes, max-genes, mito filters, each logging its removal
    * count into qc_stats["filters_applied"]). The reference applies
    * the filters in sequence, so a cell failing several is counted
    * once, by the FIRST failing filter — mirrored here as a CASE
    * ladder in the same order. `status = 'kept'` rows are the
    * surviving cells; grouping the output by status reproduces the
    * reference's per-filter cells_removed audit.
    *
    * Purely narrow over the qcMetrics frame — the status column costs
    * nothing at any scale.
    */
  def qcFilter(metrics: DataFrame, t: QcThresholds): DataFrame =
    metrics.withColumn("status",
      when(col("total_counts") < t.minCounts, lit("empty_droplet"))
        .when(col("n_genes") < t.minGenes, lit("low_genes"))
        .when(col("n_genes") >= t.maxGenes, lit("high_genes"))
        .when(col("pct_mt") >= t.maxMitoPct, lit("high_mito"))
        .otherwise(lit("kept")))

  /** Pseudobulk aggregation (reference: agent_singlecell.py:1838
    * _generate_pseudobulk — per-cluster summed counts over the
    * cluster assignment, then CPM-like scaling: each cluster column
    * divided by its own total × 1e6).
    *
    * Input: long-form (cluster, gene, count) rows — the caller joins
    * the cluster assignment onto the matrix (one broadcast-able join
    * when clusters come from a codebook assignment; the assignment
    * frame is cell-cardinality but only (cell, cluster) wide).
    *
    * One map-side-combinable hash aggregate over (cluster, gene);
    * cluster library sizes re-aggregate from the RESULT (panel-scale,
    * never matrix-scale) and broadcast back. The reference's
    * pseudobulk frame is DENSE (genes × clusters, missing = 0 because
    * the source matrix is a dense array) — mirrored by a panel-scale
    * genes × clusters cross join with coalesce-to-zero, so
    * downstream DEG sees every gene in every cluster exactly as the
    * reference does.
    *
    * Output: (clusterCol, geneCol, pb_count, cpm) — cpm = count /
    * cluster-total × 1e6, the reference's TPM-like value. pb_count
    * sums are exact for integral counts, so the cpm ratio is
    * bit-identical cross-engine; rounded to 6dp regardless
    * (belt-and-braces, like deg_cpm). A cluster whose whole library
    * sums to 0 gets cpm 0.0 for every gene (coalesced — the
    * reference's dense array would divide 0/0; all-zero clusters
    * cannot occur from a positive count matrix anyway).
    *
    * `genePanel` (optional, one geneCol column): densify against this
    * FIXED panel instead of the genes observed in `assigned` — the
    * reference's pseudobulk frame is indexed by the full adata.var
    * gene universe, so a gene absent from every cluster appears as a
    * zero row there; deriving the universe from the aggregate drops
    * it. Pass the var panel for reference-exact shape.
    */
  def pseudobulk(
      assigned: DataFrame, clusterCol: String, geneCol: String,
      countCol: String, genePanel: Option[DataFrame] = None): DataFrame = {
    val pb = assigned
      .groupBy(col(clusterCol), col(geneCol))
      .agg(sum(col(countCol)).as("pb_count"))
    val genes = genePanel
      .map(_.select(col(geneCol)).distinct())
      .getOrElse(pb.select(col(geneCol)).distinct())
    val clusters = pb.select(col(clusterCol)).distinct()
    val dense = clusters.crossJoin(genes)
      .join(pb, Seq(clusterCol, geneCol), "left")
      .withColumn("pb_count", coalesce(col("pb_count"), lit(0.0)))
    // library sizes from the SPARSE aggregate, not the densified
    // frame — identical totals (densified zeros add nothing), and it
    // keeps `dense` single-use so the cross-join branch is never
    // duplicated in the plan (the oracle computes lib from pb too)
    val lib = pb.groupBy(col(clusterCol))
      .agg(sum(col("pb_count")).as("lib_size"))
    dense
      .join(broadcast(lib), Seq(clusterCol))
      .select(col(clusterCol), col(geneCol), col("pb_count"),
        coalesce(
          r6(col("pb_count") / nullif(col("lib_size"), lit(0.0)) * lit(1e6)),
          lit(0.0)).as("cpm"))
  }

  /** Highly-variable gene selection (reference:
    * agent_singlecell.py:835 _select_hvg —
    * sc.pp.highly_variable_genes, seurat flavor: per-gene mean and
    * dispersion (variance/mean) of log-normalized expression,
    * dispersions z-normalized WITHIN equal-width mean-expression
    * bins, top-N by normalized dispersion).
    *
    * Input: long-form (cell, gene, count) molecule rows. One
    * matrix-scale aggregate builds the sparse entries; per-cell
    * library sizes join back (one shuffle keyed by cell — the only
    * second touch of matrix-scale data); per-gene moments then come
    * off a single map-side-combinable aggregate EXPLOITING SPARSITY:
    * a missing (cell, gene) entry contributes ln(1+0) = 0 to both
    * moment sums, so dense-universe means/variances fall out of
    * sparse sums plus the scalar cell count — no densification ever
    * materializes. Everything after runs on the gene panel (windows
    * over |genes| rows).
    *
    * Cross-engine protocol: expression = ln(1 + count·1e4/cell_total)
    * (scanpy normalize_total + log1p), variances via explicit moment
    * formulas, binning and ranking on ROUNDED values (6dp, +1e-9
    * nudge) with gene tiebreaks. Genes with zero mean, and genes in
    * singleton or zero-spread bins, have no defined normalized
    * dispersion and are excluded — the analog of scanpy dropping NaN
    * dispersions.
    *
    * Output: (geneCol, mu, disp, disp_norm, rnk), rnk 1..topN.
    */
  def hvg(
      matrix: DataFrame, cellCol: String, geneCol: String,
      countCol: String, nBins: Int = 10, topN: Int = 20): DataFrame = {
    require(nBins > 0 && topN > 0, "nBins and topN must be positive")
    val entry = matrix
      .groupBy(col(cellCol), col(geneCol))
      .agg(sum(col(countCol)).as("cnt"))
    val totals = entry.groupBy(col(cellCol))
      .agg(sum(col("cnt")).as("cell_total"))
    val ncells = totals.agg(count(lit(1)).cast("double").as("n_cells"))
    val ex = entry.join(totals, Seq(cellCol))
      .select(col(geneCol),
        log(lit(1.0) + col("cnt") * lit(1e4) / col("cell_total")).as("x"))
    val g = ex.groupBy(col(geneCol))
      .agg(sum(col("x")).as("s"), sum(col("x") * col("x")).as("ss"))
      .crossJoin(broadcast(ncells))
    val mu = col("s") / col("n_cells")
    val vr = (col("ss") - col("s") * col("s") / col("n_cells")) /
      nullif(col("n_cells") - 1.0, lit(0.0))
    val stats = g
      .select(col(geneCol), r6(mu).as("mu"),
        r6(vr / nullif(mu, lit(0.0))).as("disp"))
      .where(col("disp").isNotNull)
    val all = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ratio = (col("mu") - min(col("mu")).over(all)) /
      nullif(max(col("mu")).over(all) - min(col("mu")).over(all), lit(0.0))
    // least() skips nulls in BOTH engines, so a degenerate all-equal-mu
    // panel (null ratio) lands every gene in the top bin consistently
    val binned = stats.withColumn("bin",
      coalesce(least(lit((nBins - 1).toLong), floor(ratio * nBins)), lit(0L)))
    val byBin = Window.partitionBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nb = count(lit(1)).over(byBin).cast("double")
    val sb = sum(col("disp")).over(byBin)
    val ssb = sum(col("disp") * col("disp")).over(byBin)
    // greatest(·, 0) guards the sqrt against rounding-negative spread;
    // a zero/undefined sd then nulls out via nullif, excluding the bin
    val sd = sqrt(greatest(
      (ssb - sb * sb / nb) / nullif(nb - 1.0, lit(0.0)), lit(0.0)))
    val normed = binned
      .withColumn("disp_norm",
        r6((col("disp") - sb / nb) / nullif(sd, lit(0.0))))
      .where(col("disp_norm").isNotNull)
    normed
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("disp_norm").desc, col(geneCol))).cast("long"))
      .where(col("rnk") <= topN)
      .select(col(geneCol), col("mu"), col("disp"), col("disp_norm"),
        col("rnk"))
      .orderBy(col("rnk"))
  }

  /** Marker-based cluster annotation (reference:
    * agent_singlecell.py:1181 _annotate_clusters_by_markers — match
    * each cluster's top-`matchLen` ranked markers (the reference's
    * set(top_markers[:30]) window at :1581) against canonical
    * cell-type signatures; :1597-1610 the position-weighted overlap
    * score: for each signature gene found among the markers,
    * score += (listLen - idx) / listLen, then ×(1 + 0.2·|overlap|);
    * :1622 the best match wins if score > minScore else
    * 'Unknown_<cluster>'; :1634-1643 duplicate cell-type names get
    * '_2', '_3'… suffixes in cluster order).
    *
    * Inputs: `markers` = ranked marker rows (clusterCol, geneCol,
    * rankCol 1-based — Stats.markerStats output shape);
    * `signatures` = the canonical (cell_type, gene) membership rows
    * (a curated panel — broadcast by construction).
    *
    * Scale: markers is clusters × listLen rows and signatures is a
    * panel — everything here is panel-scale; the only join is
    * markers ⋈ broadcast(signatures). Windows partition by cluster
    * (argmax) or cell type (duplicate numbering) over ≤|clusters|
    * rows.
    *
    * Cross-engine protocol: the per-match weight (listLen − (rnk−1))
    * / listLen is a small-int division — identical IEEE doubles both
    * engines — but the overlap SUM's fold order is engine-specific,
    * so the final score is rounded to 6dp (+1e-9 nudge) and the
    * argmax/threshold run on the ROUNDED score with a cell-type-name
    * tiebreak.
    *
    * `subtypes` (optional, columns cell_type/subtype/geneCol): the
    * reference's subtype refinement (:1613-1618) — when the WINNING
    * cell type has a subtype whose markers overlap the match window
    * in ≥2 genes, the subtype name replaces the cell-type name
    * before thresholding and duplicate numbering. Deviations from
    * the Python, both deliberate: qualifying subtypes resolve by
    * NAME order (the reference takes dict-insertion order — not a
    * relational concept), and a losing candidate's subtype can never
    * leak onto a later winner (the reference never resets
    * subtype_match between candidates, a latent-state artifact, not
    * semantics worth reproducing).
    *
    * Output: one row per cluster — (clusterCol, cell_type, score,
    * n_overlap), where cell_type carries the reference's Unknown
    * fallback and duplicate suffixes.
    */
  def annotateClusters(
      markers: DataFrame, clusterCol: String, geneCol: String,
      rankCol: String, signatures: DataFrame, listLen: Int = 50,
      minScore: Double = 1.0, matchLen: Int = 30,
      subtypes: Option[DataFrame] = None): DataFrame = {
    val sig = signatures
      .select(col("cell_type"), col(geneCol))
      .distinct()
    val weight = (lit(listLen) - (col(rankCol) - 1).cast("double")) /
      lit(listLen.toDouble)
    // the reference matches against set(top_markers[:30]) while
    // WEIGHTING by top-50 position (agent_singlecell.py:1581,1605):
    // only ranks <= matchLen may overlap, and ranks beyond listLen
    // never score (they'd get zero/negative weights otherwise)
    val matched = markers
      .where(col(rankCol) <= lit(math.min(matchLen, listLen)))
    val scored = matched
      .join(broadcast(sig), Seq(geneCol))
      .groupBy(col(clusterCol), col("cell_type"))
      .agg(sum(weight).as("raw_w"), count(lit(1)).as("n_overlap"))
      .withColumn("score",
        r6(col("raw_w") * (lit(1.0) + lit(0.2) * col("n_overlap"))))
    val byScore = Window.partitionBy(col(clusterCol))
      .orderBy(col("score").desc, col("cell_type"))
    val best = scored
      .withColumn("rn", row_number().over(byScore))
      .where(col("rn") === 1)
      .select(col(clusterCol), col("cell_type"), col("score"),
        col("n_overlap"))
    // subtype refinement: the winner's first qualifying subtype
    // (>= 2 match-window overlaps, name order) replaces its name.
    // Panel-scale throughout — subtype hits group clusters × subtypes
    val refined = subtypes.fold(best) { st =>
      val subSig = st
        .select(col("cell_type"), col("subtype"), col(geneCol))
        .distinct()
      val firstSub = matched
        .join(broadcast(subSig), Seq(geneCol))
        .groupBy(col(clusterCol), col("cell_type"), col("subtype"))
        .agg(count(lit(1)).as("sub_overlap"))
        .where(col("sub_overlap") >= 2)
        .withColumn("srn", row_number().over(
          Window.partitionBy(col(clusterCol), col("cell_type"))
            .orderBy(col("subtype"))))
        .where(col("srn") === 1)
        .select(col(clusterCol), col("cell_type"), col("subtype"))
      best.join(firstSub, Seq(clusterCol, "cell_type"), "left")
        .select(col(clusterCol),
          coalesce(col("subtype"), col("cell_type")).as("cell_type"),
          col("score"), col("n_overlap"))
    }
    // clusters with NO signature overlap at all drop out of the join —
    // restore them from the markers frame so they still annotate as
    // Unknown_<cluster>, like the reference's else branch
    val allClusters = markers.select(col(clusterCol)).distinct()
    val labeled = allClusters
      .join(refined, Seq(clusterCol), "left")
      .withColumn("base_type",
        when(col("score") > minScore, col("cell_type"))
          .otherwise(concat(lit("Unknown_"), col(clusterCol).cast("string"))))
    // duplicate numbering in cluster order: first keeps the bare
    // name, later clusters of the same type get _2, _3, ...
    val byType = Window.partitionBy(col("base_type"))
      .orderBy(col(clusterCol))
    labeled
      .withColumn("dup_rn", row_number().over(byType))
      .select(col(clusterCol),
        when(col("dup_rn") === 1, col("base_type"))
          .otherwise(concat(col("base_type"), lit("_"),
            col("dup_rn").cast("string"))).as("cell_type"),
        // the reference records score 0 for Unknown clusters
        // (agent_singlecell.py:1630), whatever the sub-threshold
        // best overlap scored
        when(col("score") > minScore, col("score")).otherwise(lit(0.0))
          .as("score"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
  }

  /** Cell-cycle phase scoring (reference: agent_singlecell.py:768
    * _score_cell_cycle — sc.tl.score_genes_cell_cycle over the Tirosh
    * et al. 2016 S / G2M gene sets, enabled by default at :247).
    *
    * scanpy's score_genes: per-cell score = mean expression of the
    * signature genes − mean expression of a CONTROL set drawn from
    * genes with similar average expression (genes ranked by their
    * all-cells mean, cut into `rank // n_items` bins with n_items ≈
    * |genes|/(nBins−1); controls come from the bins the signature
    * genes land in). Two deliberate deterministic deviations, both
    * documented here because random state is not a relational
    * concept: the control set is ALL non-signature genes of the
    * matched bins (scanpy samples ctrl_size=50 of them at random —
    * the full bin is that estimator's deterministic limit), and
    * n_items uses floor instead of Python's banker-rounding round().
    *
    * Phase call (scanpy's rule, in override order): 'S' by default,
    * 'G2M' when g2m_score > s_score, 'G1' when both scores < 0.
    * Comparisons run on the ROUNDED 6dp scores so both engines cut
    * identically; a cell with a null score (possible only when a
    * signature set or its control set is empty in the panel) gets a
    * null phase rather than a silent 'S'.
    *
    * Scale: the matrix is aggregated TWICE (once for the gene-mean
    * panel, once for the per-cell conditional sums — same contract as
    * hvg's second touch); expression is ln(1 + count·1e4/cell_total)
    * (scanpy normalize_total + log1p), sparsity-exploiting because a
    * missing entry contributes ln(1) = 0 to every sum. All binning /
    * flagging windows run on the GENE PANEL (≤2×10⁴ rows); the panel
    * and the 4 set-size scalars broadcast back to matrix scale.
    *
    * Output: (cellCol, s_score, g2m_score, phase).
    */
  /** Shared score_genes core: per-cell signature-minus-control score
    * columns for N gene sets in ONE pass over the matrix (the set
    * flags widen the panel, not the scan count). Output columns
    * `score_0..score_{n-1}` in `sets` order; a set whose present-gene
    * count is below `minGenes`, or whose control set is empty, scores
    * null. See cellCycleScores for the algorithm contract.
    */
  private def scoreSetsWide(
      matrix: DataFrame, cellCol: String, geneCol: String,
      countCol: String, sets: Seq[Seq[String]], nBins: Int,
      minGenes: Int): DataFrame = {
    require(nBins >= 2, "nBins must be >= 2")
    val entry = matrix
      .groupBy(col(cellCol), col(geneCol))
      .agg(sum(col(countCol)).as("cnt"))
    val totals = entry.groupBy(col(cellCol))
      .agg(sum(col("cnt")).as("cell_total"))
    val ncells = totals.agg(count(lit(1)).cast("double").as("n_cells"))
    val ex = entry.join(totals, Seq(cellCol))
      .select(col(cellCol), col(geneCol),
        log(lit(1.0) + col("cnt") * lit(1e4) / col("cell_total")).as("x"))
    val mu = ex.groupBy(col(geneCol))
      .agg(sum(col("x")).as("sx"))
      .crossJoin(broadcast(ncells))
      .select(col(geneCol), r6(col("sx") / col("n_cells")).as("mu"))
    // rank-based expression bins (scanpy: obs_avg.rank(method='min')
    // // n_items): competition rank over the ROUNDED mean only — ties
    // share a rank in both engines, no tiebreak needed
    val whole = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val binned = mu
      .withColumn("npanel", count(lit(1)).over(whole).cast("double"))
      .withColumn("g_rank",
        rank().over(Window.orderBy(col("mu"))).cast("double"))
      .withColumn("bin", floor(col("g_rank") / greatest(lit(1.0),
        floor(col("npanel") / lit((nBins - 1).toDouble)))))
    val withIn = sets.zipWithIndex.foldLeft(binned) {
      case (df, (genes, i)) =>
        df.withColumn(s"in_$i", col(geneCol).isin(genes: _*))
    }
    val byBin = Window.partitionBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val flags = sets.indices.foldLeft(withIn) { (df, i) =>
      df.withColumn(s"ctrl_$i",
        max(when(col(s"in_$i"), lit(1)).otherwise(lit(0))).over(byBin) === 1
          && !col(s"in_$i"))
    }.select(col(geneCol) +:
      sets.indices.flatMap(i => Seq(col(s"in_$i"), col(s"ctrl_$i"))): _*)
    val sizeAggs = sets.indices.flatMap(i => Seq(
      sum(when(col(s"in_$i"), lit(1.0)).otherwise(lit(0.0)))
        .as(s"n_in_$i"),
      sum(when(col(s"ctrl_$i"), lit(1.0)).otherwise(lit(0.0)))
        .as(s"n_ctrl_$i")))
    val sizes = flags.agg(sizeAggs.head, sizeAggs.tail: _*)
    val sumAggs = sets.indices.flatMap(i => Seq(
      sum(when(col(s"in_$i"), col("x")).otherwise(lit(0.0)))
        .as(s"x_in_$i"),
      sum(when(col(s"ctrl_$i"), col("x")).otherwise(lit(0.0)))
        .as(s"x_ctrl_$i")))
    val cellSums = ex.join(broadcast(flags), Seq(geneCol))
      .groupBy(col(cellCol))
      .agg(sumAggs.head, sumAggs.tail: _*)
    cellSums.crossJoin(broadcast(sizes))
      .select(col(cellCol) +: sets.indices.map { i =>
        when(col(s"n_in_$i") < minGenes.toDouble,
          lit(null).cast("double"))
          .otherwise(r6(
            col(s"x_in_$i") / nullif(col(s"n_in_$i"), lit(0.0)) -
              col(s"x_ctrl_$i") / nullif(col(s"n_ctrl_$i"), lit(0.0))))
          .as(s"score_$i")
      }: _*)
  }

  def cellCycleScores(
      matrix: DataFrame, cellCol: String, geneCol: String,
      countCol: String, sGenes: Seq[String], g2mGenes: Seq[String],
      nBins: Int = 25): DataFrame =
    scoreSetsWide(matrix, cellCol, geneCol, countCol,
      Seq(sGenes, g2mGenes), nBins, minGenes = 1)
      .select(col(cellCol), col("score_0").as("s_score"),
        col("score_1").as("g2m_score"))
      .withColumn("phase",
        when(col("s_score").isNull || col("g2m_score").isNull,
          lit(null).cast("string"))
          .when(col("s_score") < 0 && col("g2m_score") < 0, lit("G1"))
          .when(col("g2m_score") > col("s_score"), lit("G2M"))
          .otherwise(lit("S")))

  /** Multi-set signature scoring in long form (reference:
    * agent_singlecell.py:2640-2656 — sc.tl.score_genes per immune
    * signature, skipping sets with fewer than 2 genes present in the
    * panel): the scanpy score_genes re-expression of cellCycleScores
    * generalized to N sets, ONE matrix pass for all of them (the set
    * flags are extra panel columns, not extra scans). A set below
    * `minGenes` present genes scores null for every cell — the
    * relational analog of the reference skipping the signature;
    * callers filter nulls.
    *
    * Output: (cellCol, signature, score), one row per cell × set.
    */
  def signatureScores(
      matrix: DataFrame, cellCol: String, geneCol: String,
      countCol: String, sets: Seq[(String, Seq[String])],
      nBins: Int = 25, minGenes: Int = 2): DataFrame = {
    val wide = scoreSetsWide(matrix, cellCol, geneCol, countCol,
      sets.map(_._2), nBins, minGenes)
    val stackArgs = sets.zipWithIndex
      .map { case ((name, _), i) => s"'${name}', score_$i" }
      .mkString(", ")
    wide.selectExpr(cellCol,
      s"stack(${sets.size}, $stackArgs) AS (signature, score)")
  }

  /** TME composition and phenotype call (reference:
    * agent_singlecell.py:2615-2629 tme_composition — per-category
    * cell counts by cell-type PREFIX match, summed per prefix exactly
    * as the Python sums str.startswith counts (a type matching two
    * prefixes of one category counts twice, faithfully); :2660-2680
    * immune/stromal totals, tumor purity, and the Hot/Altered/Cold
    * phenotype ladder (immune% > 30 with cytotoxic types present →
    * 'Hot (Inflamed)', > 15 → 'Immune-Altered', else
    * 'Cold (Desert)'; cytotoxic presence = any cell type matching
    * CD8|NK|cytotoxic case-insensitively).
    *
    * ONE conditional aggregate over the cell-cardinality type frame
    * computes every per-prefix count and the cytotoxic flag; the
    * single row then unstacks to category rows. Output: (category,
    * n_cells, pct, tumor_phenotype) — categories in caller order plus
    * 'immune_total', 'stromal_total', 'tumor_purity' summary rows,
    * pct rounded 6dp.
    */
  def tmeComposition(
      cellTypes: DataFrame, typeCol: String,
      categories: Seq[(String, Seq[String])],
      immunePrefixes: Seq[String], stromalPrefixes: Seq[String])
      : DataFrame = {
    def prefixCount(ps: Seq[String]): Column = ps.map(p =>
      sum(when(col(typeCol).startsWith(p), lit(1L)).otherwise(lit(0L))))
      .reduce(_ + _)
    val aggs =
      categories.map { case (name, ps) => prefixCount(ps).as(s"c_$name") } ++
        Seq(prefixCount(immunePrefixes).as("c_imm_total"),
          prefixCount(stromalPrefixes).as("c_str_total"),
          count(lit(1)).as("c_total"),
          max(when(lower(col(typeCol)).rlike("cd8|nk|cytotoxic"), lit(1))
            .otherwise(lit(0))).as("cytotoxic_present"))
    val row = cellTypes.agg(aggs.head, aggs.tail: _*)
      .withColumn("immune_pct",
        col("c_imm_total").cast("double") / col("c_total") * 100.0)
      .withColumn("tumor_phenotype",
        when(col("immune_pct") > 30.0 && col("cytotoxic_present") === 1,
          lit("Hot (Inflamed)"))
          .when(col("immune_pct") > 15.0, lit("Immune-Altered"))
          .otherwise(lit("Cold (Desert)")))
    val catArgs = (categories.map { case (name, _) =>
      s"'$name', c_$name"
    } ++ Seq("'immune_total', c_imm_total", "'stromal_total', c_str_total",
      "'tumor_purity', c_total - c_imm_total - c_str_total"))
      .mkString(", ")
    row.selectExpr(
      s"stack(${categories.size + 3}, $catArgs) AS (category, n_cells)",
      "c_total", "tumor_phenotype")
      .select(col("category"), col("n_cells"),
        r6(col("n_cells").cast("double") / col("c_total") * 100.0)
          .as("pct"),
        col("tumor_phenotype"))
  }

  /** Ploidy inference / malignant-cell detection (reference:
    * agent_singlecell.py:2908 _infer_ploidy — per-chromosome
    * expression z-scores against a diploid reference population,
    * chromosome score = mean |z|, per-cell ploidy = mean over
    * chromosomes and CIN = population std over chromosomes,
    * adaptive 75th/90th-percentile malignancy thresholds, and the
    * per-cell-type summary the reference saves as
    * ploidy_by_celltype.csv at :3052).
    *
    * Inputs: `expr` = long-form (cell, gene, x) expression rows
    * (the reference scores adata.X post-normalization); `cellTypes` =
    * (cell, cell_type); `chromPanel` = the (chrom, gene) assignment
    * (reference :2931 — a curated subset, broadcast by construction);
    * `refCells` = the diploid reference population (:2957 — immune
    * cells; the reference's <50-immune median fallback is the
    * caller's branch to take, not replicated here).
    *
    * DENSE-SEMANTICS RECOVERY: the reference z-scores a dense matrix,
    * so a missing (cell, gene) entry still contributes
    * |0 − μ_g|/σ_g = μ_g/σ_g (x ≥ 0 post-lognorm ⇒ μ ≥ 0). That
    * per-gene constant makes the dense Σ|z| sparse-computable:
    * Σ_dense |z| = Σ_present (|z(x)| − μ/σ) + Σ_panel μ/σ, where the
    * second term is a per-chromosome constant. No densification ever
    * materializes — the same device as hvg's sparse moments.
    *
    * Scale: two aggregates over the PANEL-RESTRICTED matrix (the
    * broadcast panel join prunes everything else): reference moments
    * per gene, then per-(cell, chrom) partial sums; everything after
    * runs on cells × |chroms| and smaller. The percentile thresholds
    * are EXACT (cross-engine oracle parity, linear interpolation in
    * both engines) over the cell-cardinality score frame — at true
    * atlas scale swap in percentile_approx at the marked spot, the
    * one deliberate exactness/scale trade in this operator.
    *
    * Cross-engine protocol: every aggregate output (moments, sums,
    * scores, thresholds) rounds to 6dp (+1e-9) before reuse, so
    * fold-order drift can never propagate; threshold compares run on
    * rounded score vs rounded threshold.
    *
    * Output: one row per cell type — (cell_type, ploidy_score,
    * ploidy_std, cin_score, n_malignant, n_total, pct_malignant).
    */
  def inferPloidy(
      expr: DataFrame, cellCol: String, geneCol: String, valueCol: String,
      cellTypes: DataFrame, chromPanel: DataFrame,
      refCells: DataFrame): DataFrame = {
    val exP = expr.select(col(cellCol), col(geneCol), col(valueCol).as("x"))
      .join(broadcast(chromPanel.select(col("chrom"), col(geneCol))),
        Seq(geneCol))
    val nRef = refCells.select(col(cellCol)).distinct()
      .agg(count(lit(1)).cast("double").as("n_ref"))
    // per-gene diploid reference moments, dense via sparse sums
    // (missing entries add 0 to both) over the reference population.
    // The gene universe is the PANEL ∩ matrix genes, NOT the genes
    // with reference-cell entries: a tumor-only panel gene (zero in
    // every reference cell) must keep its dense mu=0 / sd=1e-6 row —
    // a tumor cell expressing it then scores |x|/1e-6, the strongest
    // amplification evidence the reference's dense z-scoring flags —
    // rather than silently vanishing from the chromosome.
    val panelGenes = chromPanel.select(col("chrom"), col(geneCol))
      .join(expr.select(col(geneCol)).distinct(), Seq(geneCol),
        "left_semi")
    val refSums = exP
      .join(refCells.select(col(cellCol)).distinct(), Seq(cellCol),
        "left_semi")
      .groupBy(col("chrom"), col(geneCol))
      .agg(sum(col("x")).as("s"), sum(col("x") * col("x")).as("ss"))
    // broadcast the BUILD side: a left join preserves panelGenes, so
    // only the refSums side can hash-build (Spark ignores — with a
    // warning — a broadcast hint on the preserved side). refSums is
    // panel-bounded (one row per panel chrom×gene), so broadcasting
    // it is the plan the hint always meant.
    val gstats = panelGenes
      .join(broadcast(refSums), Seq("chrom", geneCol), "left")
      .crossJoin(broadcast(nRef))
      .select(col("chrom"), col(geneCol),
        r6(coalesce(col("s"), lit(0.0)) / col("n_ref")).as("mu"),
        r6(sqrt(greatest(coalesce(col("ss"), lit(0.0)) / col("n_ref") -
          pow(coalesce(col("s"), lit(0.0)) / col("n_ref"), 2),
          lit(0.0))) + lit(1e-6))
          .as("sd"))
      .withColumn("z0", col("mu") / col("sd"))
    // per-chromosome constants: the all-absent baseline sum and size
    val chromConst = gstats.groupBy(col("chrom"))
      .agg(r6(sum(col("z0"))).as("z0_sum"),
        count(lit(1)).cast("double").as("n_genes"))
    // sparse correction per (cell, chrom): present entries replace
    // their zero-z term with the actual |z|
    val corr = exP
      .join(broadcast(gstats.select(col(geneCol), col("mu"), col("sd"),
        col("z0"))), Seq(geneCol))
      .groupBy(col(cellCol), col("chrom"))
      .agg(r6(sum(abs((col("x") - col("mu")) / col("sd")) - col("z0")))
        .as("dsum"))
    val cells = expr.select(col(cellCol)).distinct()
    val chromScores = cells.crossJoin(broadcast(chromConst))
      .join(corr, Seq(cellCol, "chrom"), "left")
      .select(col(cellCol), col("chrom"),
        r6((coalesce(col("dsum"), lit(0.0)) + col("z0_sum")) /
          col("n_genes")).as("chr_score"))
    // cached: the threshold aggregate and the labeling pass both read
    // it (lifecycle: caller-owned, see graft.Caching)
    val perCell = chromScores.groupBy(col(cellCol))
      .agg(r6(avg(col("chr_score"))).as("ploidy_score"),
        r6(stddev_pop(col("chr_score"))).as("cin_score"))
      .cache()
    // adaptive thresholds — EXACT percentiles for oracle parity; at
    // atlas scale substitute percentile_approx here
    val thresholds = perCell.agg(
      r6(expr_fn("percentile(ploidy_score, 0.75)")).as("q75"),
      r6(expr_fn("percentile(ploidy_score, 0.90)")).as("q90"))
    val labeled = perCell.crossJoin(broadcast(thresholds))
      .withColumn("malignancy",
        when(col("ploidy_score") > col("q90"),
          lit("High_Confidence_Malignant"))
          .when(col("ploidy_score") > col("q75"), lit("Likely_Malignant"))
          .otherwise(lit("Likely_Normal")))
    labeled
      .join(cellTypes.select(col(cellCol), col("cell_type")),
        Seq(cellCol))
      .groupBy(col("cell_type"))
      .agg(r6(avg(col("ploidy_score"))).as("ploidy_score"),
        r6(stddev_samp(col("ploidy_score"))).as("ploidy_std"),
        r6(avg(col("cin_score"))).as("cin_score"),
        sum(when(col("malignancy") =!= "Likely_Normal", 1L)
          .otherwise(0L)).as("n_malignant"),
        count(lit(1)).as("n_total"))
      .withColumn("pct_malignant",
        r6(col("n_malignant").cast("double") / col("n_total") * 100.0))
  }

  private def expr_fn(s: String): Column =
    org.apache.spark.sql.functions.expr(s)

  /** SCENIC-style gene-regulatory-network edges per cell type
    * (reference: agent_singlecell.py:2726 _analyze_grn — per cell
    * type with ≥20 cells, Spearman correlation between each curated
    * TF's expression and each of the first `maxTargets` non-TF
    * genes, both sides requiring expression std ≥ 0.1; edges kept at
    * |ρ| > 0.3 and p < 0.05, labeled activation/repression, top 50
    * per type by |ρ|).
    *
    * DENSE-RANK RECOVERY (the ploidy device, rank edition): Spearman
    * is Pearson on dense ranks, and a cell missing a gene has x = 0 —
    * the minimum — so all absent cells TIE at average rank
    * z0 = (n_zero+1)/2, a per-(type, gene) constant, and a present
    * cell ranks n_zero + its average rank among present entries.
    * Closed forms do the rest: Σr over the dense universe is always
    * n(n+1)/2, Σr² = sparse Σr² + n_zero·z0², and the cross sum
    * decomposes as Σ_co-present + z0-weighted corrections from the
    * per-gene sparse totals. Nothing densifies.
    *
    * Scale contract: the rank windows shuffle the panel-restricted
    * matrix once, keyed (type, gene), with partitions bounded by
    * cells-per-type; the TF-side × target-side join is keyed
    * (type, cell) with fan-out bounded by the CURATED TF panel
    * (reference: ~45 TFs) × maxTargets — the SCENIC-style contract
    * that keeps the pair space panel-bounded, like correlationEdges'
    * maxFeatures cap. Everything after the pair aggregate is
    * types × TFs × targets panel scale.
    *
    * Deliberate deviations, both cross-engine-replayed in the oracle:
    * the p-value uses the module's normal-tail approximation of the
    * Spearman t statistic (scipy uses the t distribution — at the
    * reference's ≥20-cell floor the approximation is the standard
    * large-sample simplification used by diffStats, and |ρ| = 1
    * pins p = 0 exactly as scipy returns); top-50 ties break on
    * (tf, target) names (pandas keeps insertion order). Std filters
    * and cuts compare ROUNDED values.
    *
    * Output: (typeCol, tf, target, correlation, p_value, regulation,
    * rnk).
    */
  def grnEdges(
      expr: DataFrame, typeCol: String, cellCol: String,
      geneCol: String, valueCol: String, tfs: Seq[String],
      maxTargets: Int = 100, minCells: Long = 20L,
      minStd: Double = 0.1, minAbsCorr: Double = 0.3,
      maxP: Double = 0.05, topPerType: Int = 50): DataFrame = {
    // NOT cached (measured, round 11): nType and roles replay the
    // caller's upstream subtree, but they run as independent broadcast
    // subtrees IN PARALLEL with the main pipeline — caching here
    // serializes stage execution behind the cache fill and measured
    // ~25% SLOWER at sf0.1 (local[32]); the replayed subtrees are
    // distinct-projections an order smaller than the matrix.
    val basis = expr
      .select(col(typeCol), col(cellCol), col(geneCol),
        r6(col(valueCol)).as("xr"))
    val nType = basis.select(col(typeCol), col(cellCol)).distinct()
      .groupBy(col(typeCol))
      .agg(count(lit(1)).cast("double").as("n_cells"))
      .where(col("n_cells") >= minCells.toDouble)
    // roles: curated TFs + the first maxTargets non-TF genes in gene
    // order (the reference's var_names[:500][:100] cap)
    val roles = basis.select(col(geneCol)).distinct()
      .withColumn("is_tf", col(geneCol).isin(tfs: _*))
      .withColumn("tgt_rank", row_number().over(
        Window.partitionBy(col("is_tf")).orderBy(col(geneCol))))
      .withColumn("is_target", !col("is_tf") &&
        col("tgt_rank") <= maxTargets)
      .where(col("is_tf") || col("is_target"))
      .select(col(geneCol), col("is_tf"), col("is_target"))
    val sub = basis
      .join(broadcast(nType), Seq(typeCol))
      .join(broadcast(roles), Seq(geneCol))
    // dense ranks from sparse entries: zeros tie below every present
    // value (expression is strictly positive where present)
    val byGene = Window.partitionBy(col(typeCol), col(geneCol))
    // cached: the per-gene aggregate, TF side, and target side all
    // read the ranked frame — without the cache each consumer replays
    // the scan + rank windows (lifecycle: caller-owned, see
    // graft.Caching)
    val ranked = sub
      .withColumn("rank_min",
        rank().over(byGene.orderBy(col("xr"))).cast("double"))
      .withColumn("cnt_eq", count(lit(1)).over(
        Window.partitionBy(col(typeCol), col(geneCol), col("xr")))
        .cast("double"))
      .withColumn("n_present",
        count(lit(1)).over(byGene).cast("double"))
      .withColumn("n_zero", col("n_cells") - col("n_present"))
      .withColumn("r_abs", col("n_zero") + col("rank_min") +
        (col("cnt_eq") - 1.0) / 2.0)
      .withColumn("z0", (col("n_zero") + 1.0) / 2.0)
      .cache()
    val gagg = ranked
      .groupBy(col(typeCol), col(geneCol), col("n_cells"),
        col("is_tf"), col("is_target"))
      .agg(count(lit(1)).cast("double").as("np"),
        sum(col("xr")).as("sx"), sum(col("xr") * col("xr")).as("sx2"),
        sum(col("r_abs")).as("srp"),
        sum(col("r_abs") * col("r_abs")).as("sr2p"))
      .withColumn("n_zero", col("n_cells") - col("np"))
      .withColumn("z0", (col("n_zero") + 1.0) / 2.0)
      // dense SAMPLE std over n cells (missing x = 0 adds nothing to
      // either moment); reference skips std < 0.1
      .withColumn("xstd", r6(sqrt(greatest(
        (col("sx2") - col("sx") * col("sx") / col("n_cells")) /
          nullif(col("n_cells") - 1.0, lit(0.0)), lit(0.0)))))
      .where(col("xstd") >= minStd)
      .withColumn("sr2", col("sr2p") + col("n_zero") * col("z0") * col("z0"))
    val tfG = gagg.where(col("is_tf")).select(col(typeCol),
      col(geneCol).as("tf"), col("n_cells"), col("srp").as("srp_a"),
      col("sr2").as("sr2_a"), col("z0").as("z0_a"), col("np").as("np_a"))
    val tgG = gagg.where(col("is_target")).select(col(typeCol),
      col(geneCol).as("target"), col("srp").as("srp_b"),
      col("sr2").as("sr2_b"), col("z0").as("z0_b"), col("np").as("np_b"))
    // co-present cross sums; a pair with NO co-present cell still has
    // a defined dense correlation — hence the left join + coalesce
    val tfSide = ranked.where(col("is_tf")).select(col(typeCol),
      col(cellCol), col(geneCol).as("tf"), col("r_abs").as("rta"))
    val tgSide = ranked.where(col("is_target")).select(col(typeCol),
      col(cellCol), col(geneCol).as("target"), col("r_abs").as("rtb"))
    val co = tfSide.hint("merge").join(tgSide, Seq(typeCol, cellCol))
      .groupBy(col(typeCol), col("tf"), col("target"))
      .agg(count(lit(1)).cast("double").as("n_ab"),
        sum(col("rta")).as("sa_ab"), sum(col("rtb")).as("sb_ab"),
        sum(col("rta") * col("rtb")).as("sab"))
    val n = col("n_cells")
    val sr = n * (n + 1.0) / 2.0 // dense rank sum, both genes
    val sxy = coalesce(col("sab"), lit(0.0)) +
      col("z0_b") * (col("srp_a") - coalesce(col("sa_ab"), lit(0.0))) +
      col("z0_a") * (col("srp_b") - coalesce(col("sb_ab"), lit(0.0))) +
      (n - col("np_a") - col("np_b") + coalesce(col("n_ab"), lit(0.0))) *
        col("z0_a") * col("z0_b")
    val corr = (n * sxy - sr * sr) /
      nullif(sqrt((n * col("sr2_a") - sr * sr) *
        (n * col("sr2_b") - sr * sr)), lit(0.0))
    val scored = tfG.join(tgG, Seq(typeCol))
      .join(co, Seq(typeCol, "tf", "target"), "left")
      .withColumn("correlation", r6(corr))
      .where(col("correlation").isNotNull &&
        abs(col("correlation")) > minAbsCorr)
      .withColumn("p_value",
        when(col("correlation") * col("correlation") >= 1.0, lit(0.0))
          .otherwise(r6(Stats.normalTwoSidedP(
            col("correlation") * sqrt((n - 2.0) /
              (lit(1.0) - col("correlation") * col("correlation")))))))
      .where(col("p_value") < maxP)
      .withColumn("regulation",
        when(col("correlation") > 0, lit("activation"))
          .otherwise(lit("repression")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(typeCol))
          .orderBy(abs(col("correlation")).desc, col("tf"),
            col("target"))).cast("long"))
      .where(col("rnk") <= topPerType)
      .select(col(typeCol), col("tf"), col("target"),
        col("correlation"), col("p_value"), col("regulation"),
        col("rnk"))
  }

  /** Ligand-receptor interaction scoring (reference:
    * agent_singlecell.py:2311 _run_simple_lr_analysis — CellChat-style
    * scoring over a curated L-R pair database: per-cell-type mean
    * expression; for each (pair, source type, target type) with
    * ligand and receptor means both ≥ minExpr,
    * score = √(ligand_expr × receptor_expr) and
    * specificity = score / (√(all_ligand × all_receptor) + 0.01)
    * where all_* is the mean of the per-type means, :2495-2516).
    *
    * Inputs: `expr` = long-form (cluster, cell, gene, value) rows of
    * the expression the caller wants means over (the reference scores
    * adata.X post log-normalization); `pairs` = the L-R panel with
    * columns ligand/receptor/pair_name/category/lr_function — a
    * curated database (the reference inlines ~100 pairs), broadcast
    * by construction.
    *
    * Scale: ONE matrix-scale hash aggregate builds the (type, gene)
    * mean frame — per-type cell counts come from a (type, cell)
    * distinct projection, types-cardinality output — and it is
    * CACHED (lifecycle: caller-owned, see graft.Caching) because the
    * ligand side, receptor side, and all-type background all read it;
    * everything downstream is panel × types scale. A missing
    * (type, gene) mean is an exact zero in the reference's dense
    * matrix and contributes zero to the background sum — sparse sums
    * over present entries divided by the scalar type count replay it
    * without densifying.
    *
    * Cross-engine protocol: means round to 6dp (+1e-9) and the
    * minExpr cut compares the ROUNDED mean; score and specificity
    * derive from rounded inputs only (√ is IEEE-exact), so both
    * engines rank identically.
    *
    * Output: one row per admissible (source, target, ligand,
    * receptor) — pair metadata + both means + score + specificity.
    */
  def ligandReceptor(
      expr: DataFrame, clusterCol: String, cellCol: String,
      geneCol: String, valueCol: String, pairs: DataFrame,
      minExpr: Double = 0.1): DataFrame = {
    val nc = expr.select(col(clusterCol), col(cellCol)).distinct()
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).cast("double").as("n_cells"))
    val ntypes = nc.agg(count(lit(1)).cast("double").as("n_types"))
    // cached: the ligand cut, receptor cut, and background all read it
    // (lifecycle: caller-owned, see graft.Caching)
    val ctMean = expr.groupBy(col(clusterCol), col(geneCol))
      .agg(sum(col(valueCol)).as("sv"))
      .join(broadcast(nc), Seq(clusterCol))
      .select(col(clusterCol), col(geneCol),
        r6(col("sv") / col("n_cells")).as("mean_expr"))
      .cache()
    val allMean = ctMean.groupBy(col(geneCol))
      .agg(sum(col("mean_expr")).as("sm"))
      .crossJoin(broadcast(ntypes))
      .select(col(geneCol), (col("sm") / col("n_types")).as("all_mean"))
    val lig = ctMean.where(col("mean_expr") >= minExpr)
      .select(col(clusterCol).as("source"), col(geneCol).as("ligand"),
        col("mean_expr").as("ligand_expr"))
    val rec = ctMean.where(col("mean_expr") >= minExpr)
      .select(col(clusterCol).as("target"), col(geneCol).as("receptor"),
        col("mean_expr").as("receptor_expr"))
    val al = allMean
      .select(col(geneCol).as("ligand"), col("all_mean").as("al"))
    val ar = allMean
      .select(col(geneCol).as("receptor"), col("all_mean").as("ar"))
    val score = sqrt(col("ligand_expr") * col("receptor_expr"))
    lig.join(broadcast(pairs), Seq("ligand"))
      .join(rec, Seq("receptor"))
      .join(broadcast(al), Seq("ligand"))
      .join(broadcast(ar), Seq("receptor"))
      .select(col("source"), col("target"), col("ligand"),
        col("receptor"), col("pair_name"), col("category"),
        col("lr_function"), col("ligand_expr"), col("receptor_expr"),
        r6(score).as("score"),
        r6(score / (sqrt(col("al") * col("ar")) + lit(0.01)))
          .as("specificity"))
  }

  /** Gene dynamics along a trajectory (reference:
    * rnaseq_pipeline/agents/singlecell/agent4_trajectory.py:362
    * _compute_gene_dynamics): Spearman correlation of every gene's
    * expression against a per-cell pseudotime, split into the top
    * nTopGenes/2 increasing (ρ > 0) and decreasing (ρ < 0) genes by
    * |ρ|. Pseudotime computation itself (DPT, :241) is spectral
    * graph machinery — model-based and out of scope like doublet
    * detection; this operator takes any pseudotime column (DPT,
    * a marker gradient, sampling time).
    *
    * Spearman uses scipy's average ranks on BOTH sides (:393
    * spearmanr). Pseudotime is dense (every cell has one): its
    * average ranks come from a two-phase prefix sum over DISTINCT
    * values (the pack_shards device — the only global window runs at
    * distinct-value cardinality, not cell cardinality). Expression is
    * sparse: dense ranks are recovered from present entries alone —
    * zeros tie at (n_zero+1)/2, present ranks shift by n_zero, and
    * the gene-level moments (Σb, Σb², Σab) collapse to closed forms
    * plus present-entry sums. Nothing densifies; per-gene math is one
    * hash aggregate over present entries.
    *
    * Mirrors the reference's guards: < minCells valid cells → empty
    * result (:376), non-finite ρ dropped (:395 — constant genes),
    * ρ = 0 belongs to neither direction (:407-408 strict
    * inequalities). p_value is the same normal-tail approximation the
    * GRN family documents (deviation from scipy's t CDF; exact 0 at
    * ρ² ≥ 1).
    *
    * Expects every expr cell to appear in pt (the sparse entries of
    * the same matrix the pseudotime was computed on).
    */
  def trajectoryDynamics(
      expr: DataFrame, pt: DataFrame, cellCol: String,
      geneCol: String, valueCol: String, ptCol: String,
      nTopGenes: Int = 50, minCells: Long = 100L): DataFrame = {
    val ptr = pt.select(col(cellCol), r6(col(ptCol)).as("ptv"))
    val vals = ptr.groupBy(col("ptv"))
      .agg(count(lit(1)).cast("double").as("cnt"))
    val wv = Window.orderBy(col("ptv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val valRanks = vals
      .withColumn("cum", coalesce(sum(col("cnt")).over(wv), lit(0.0)))
      .withColumn("a_rank", col("cum") + (col("cnt") + 1.0) / 2.0)
    // scalar frame: n cells + Σa² (tie-adjusted); empty when the
    // reference would skip — the crossJoin then empties everything
    val scal = valRanks
      .agg(sum(col("cnt")).as("n_cells"),
        sum(col("cnt") * col("a_rank") * col("a_rank")).as("sa2"))
      .where(col("n_cells") >= minCells.toDouble)
    val ptRanked = ptr
      .join(valRanks.select(col("ptv"), col("a_rank")), Seq("ptv"))
      .select(col(cellCol), col("a_rank"))
    // present-entry ranks among present rows only; the n_zero shift
    // and zero-tie mass enter at the gene level in closed form
    val byGene = Window.partitionBy(col(geneCol))
    val ranked = expr
      .select(col(cellCol), col(geneCol), r6(col(valueCol)).as("xr"))
      .join(ptRanked, Seq(cellCol))
      .withColumn("rank_min",
        rank().over(byGene.orderBy(col("xr"))).cast("double"))
      .withColumn("cnt_eq", count(lit(1)).over(
        Window.partitionBy(col(geneCol), col("xr"))).cast("double"))
      .withColumn("rp", col("rank_min") + (col("cnt_eq") - 1.0) / 2.0)
    val gagg = ranked.groupBy(col(geneCol))
      .agg(count(lit(1)).cast("double").as("np"),
        sum(col("a_rank")).as("sa_p"),
        sum(col("rp")).as("srp"),
        sum(col("rp") * col("rp")).as("srp2"),
        sum(col("a_rank") * col("rp")).as("sarp"))
      .crossJoin(broadcast(scal))
    val n = col("n_cells")
    val nz = n - col("np")
    val z0 = (nz + 1.0) / 2.0
    val sr = n * (n + 1.0) / 2.0
    // Σb² over all cells: present (n_zero+rp)² expanded + zero ties
    val sb2 = col("np") * nz * nz + lit(2.0) * nz * col("srp") +
      col("srp2") + nz * z0 * z0
    // Σab: present a·(n_zero+rp) expanded + zero cells at rank z0
    val sab = nz * col("sa_p") + col("sarp") +
      z0 * (sr - col("sa_p"))
    val corr = (n * sab - sr * sr) /
      nullif(sqrt((n * col("sa2") - sr * sr) * (n * sb2 - sr * sr)),
        lit(0.0))
    gagg
      .withColumn("correlation", r6(corr))
      .where(col("correlation").isNotNull &&
        col("correlation") =!= 0.0)
      .withColumn("p_value",
        when(col("correlation") * col("correlation") >= 1.0, lit(0.0))
          .otherwise(r6(Stats.normalTwoSidedP(
            col("correlation") * sqrt((n - 2.0) /
              (lit(1.0) - col("correlation") * col("correlation")))))))
      .withColumn("direction",
        when(col("correlation") > 0, lit("increasing"))
          .otherwise(lit("decreasing")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("direction"))
          .orderBy(abs(col("correlation")).desc, col(geneCol)))
        .cast("long"))
      .where(col("rnk") <= nTopGenes / 2)
      .select(col("direction"), col(geneCol), col("correlation"),
        col("p_value"), col("rnk"))
  }

  /** Root-cluster detection for trajectory analysis (reference:
    * agent4_trajectory.py:286 _detect_root_cluster + :312
    * _find_centroid_cell): each cluster scores the DENSE mean of the
    * stem/progenitor marker panel over its cells — sum of present
    * (cell, marker) entries divided by n_cells × n_markers_present,
    * zeros contributing nothing to the numerator, exactly the
    * reference's np.mean over the dense slice. The panel restricts to
    * markers present in the gene universe (:298 — absent markers
    * shrink the denominator, they don't zero-pad it). The best
    * cluster's root cell is the one nearest the cluster's 2D-embedding
    * centroid (:312 — UMAP or PCA[:, :2]; the embedding is an input
    * here, like pseudotime in trajectoryDynamics).
    *
    * DEVIATIONS (documented): score ties rank by cluster name and
    * centroid-distance ties by cell id — the reference keeps
    * first-in-iteration-order, undefined for a distributed table.
    * Squared distance replaces the norm (same argmin); centroid and
    * distances round to 6dp before comparison so both engines pick
    * the same cell.
    *
    * Scale: marker scoring is one hash aggregate over the
    * marker-filtered scan (the panel filter prunes the scan to
    * |markers| genes); the centroid path touches ONE cluster's
    * coordinate rows. Output is cluster-cardinality.
    */
  def trajectoryRoot(
      expr: DataFrame, clusters: DataFrame, coords: DataFrame,
      cellCol: String, geneCol: String, valueCol: String,
      clusterCol: String, xCol: String, yCol: String,
      stemMarkers: Seq[String]): DataFrame = {
    // markers present in the universe — a scalar count every cluster
    // shares (the reference recomputes it per cluster, same value)
    val present = expr.select(col(geneCol)).distinct()
      .where(col(geneCol).isin(stemMarkers: _*))
    val m = present.agg(count(lit(1)).cast("double").as("n_markers"))
      .where(col("n_markers") > 0.0)
    val nByCluster = clusters.groupBy(col(clusterCol))
      .agg(count(lit(1)).cast("double").as("n_cells"))
    val markerSums = expr
      .join(broadcast(present), Seq(geneCol))
      .join(clusters, Seq(cellCol))
      .groupBy(col(clusterCol))
      .agg(sum(col(valueCol)).as("sv"))
    val scored = nByCluster
      .join(markerSums, Seq(clusterCol), "left")
      .crossJoin(broadcast(m))
      .withColumn("stem_score", r6(coalesce(col("sv"), lit(0.0)) /
        (col("n_cells") * col("n_markers"))))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("stem_score").desc, col(clusterCol)))
        .cast("long"))
    val best = scored.where(col("rnk") === 1L)
      .select(col(clusterCol))
    val bestCells = clusters.join(broadcast(best), Seq(clusterCol))
      .join(coords, Seq(cellCol))
    val centroid = bestCells.groupBy(col(clusterCol))
      .agg(r6(avg(col(xCol))).as("_cx"), r6(avg(col(yCol))).as("_cy"))
    val root = bestCells.join(broadcast(centroid), Seq(clusterCol))
      .withColumn("_d2", r6((col(xCol) - col("_cx")) *
        (col(xCol) - col("_cx")) +
        (col(yCol) - col("_cy")) * (col(yCol) - col("_cy"))))
      .withColumn("_drnk", row_number().over(
        Window.partitionBy(col(clusterCol))
          .orderBy(col("_d2"), col(cellCol))))
      .where(col("_drnk") === 1)
      .select(col(clusterCol), col(cellCol).as("root_cell"))
    scored.join(root, Seq(clusterCol), "left")
      .select(col(clusterCol), col("stem_score"), col("rnk"),
        col("root_cell"))
  }

  /** Simplified per-cell CNV scoring (reference:
    * rnaseq_pipeline/agents/singlecell/agent5_cnv_ml.py:453
    * _simplified_cnv_inference): for each chromosome, the deviation
    * |mean over the chromosome's genes of the cell's expression −
    * mean of those genes' global means|; the cell's cnv_score is the
    * mean deviation across chromosomes. Genes mapping to 'unknown'
    * are excluded (:467); fewer than minMapped mapped genes → empty
    * result (:470 skip).
    *
    * Sparse recovery: every mean is dense (zeros count) — cell×chrom
    * means are present-entry sums over G_chr, gene means are
    * present-entry sums over n_cells. A cell with NO entry on a
    * chromosome still deviates by |0 − chrom mean|, so the per-cell ×
    * per-chrom frame densifies over cells × chromosomes — chromosome
    * cardinality is ~24, so that cross join is a broadcast of a tiny
    * dim, not a blowup. All other steps are hash aggregates on the
    * sparse entries.
    *
    * Cross-engine: means and deviations round to 6dp (+1e-9) at each
    * named stage so both engines sum identical 6dp terms.
    */
  def cnvScores(
      expr: DataFrame, chromMap: DataFrame, cellCol: String,
      geneCol: String, valueCol: String, chromCol: String,
      minMapped: Int = 10): DataFrame = {
    val mapped = chromMap.where(col(chromCol) =!= "unknown")
    val genes = expr.select(col(geneCol)).distinct()
      .join(broadcast(mapped), Seq(geneCol))
    val guard = genes.agg(count(lit(1)).as("n_mapped"))
      .where(col("n_mapped") >= minMapped.toLong)
    val cells = expr.select(col(cellCol)).distinct()
    val nCells = cells.agg(count(lit(1)).cast("double").as("n_cells"))
    // dense global mean per mapped gene
    val geneMeans = expr.join(broadcast(genes), Seq(geneCol))
      .groupBy(col(geneCol), col(chromCol))
      .agg(sum(col(valueCol)).as("sx"))
      .crossJoin(broadcast(nCells))
      .withColumn("gm", r6(col("sx") / col("n_cells")))
    // per-chromosome gene count + mean of gene means
    val chromStats = geneMeans.groupBy(col(chromCol))
      .agg(count(lit(1)).cast("double").as("g_chr"),
        sum(col("gm")).as("sgm"))
      .withColumn("chrm", r6(col("sgm") / col("g_chr")))
      .select(col(chromCol), col("g_chr"), col("chrm"))
    val nChrom = chromStats
      .agg(count(lit(1)).cast("double").as("n_chrom"))
    // sparse per (cell, chrom) sums, densified over cells × chroms
    val cellChrom = expr.join(broadcast(genes), Seq(geneCol))
      .groupBy(col(cellCol), col(chromCol))
      .agg(sum(col(valueCol)).as("scx"))
    val dense = cells.crossJoin(broadcast(chromStats))
      .join(cellChrom, Seq(cellCol, chromCol), "left")
      .withColumn("cm", r6(coalesce(col("scx"), lit(0.0)) /
        col("g_chr")))
      .withColumn("dev", r6(abs(col("cm") - col("chrm"))))
    dense.groupBy(col(cellCol))
      .agg(sum(col("dev")).as("sdev"))
      .crossJoin(broadcast(nChrom))
      .crossJoin(broadcast(guard))
      .select(col(cellCol),
        r6(col("sdev") / col("n_chrom")).as("cnv_score"))
  }

  /** Malignant-cell detection (agent5_cnv_ml.py:621
    * _detect_malignant_cells): malignant_score = 0.5 × min-max
    * normalized cnv_score + 0.3 × min-max normalized cancer-marker
    * mean + 0.2 if the cell type matches none of the immune-type
    * substrings (case-insensitive contains, :655 — so 'Treg' counts
    * NON-immune, faithfully). Classification threshold 0.5 (:668).
    * The min-max denominators carry the reference's +1e-10 guard.
    * No present markers → the marker component contributes 0 for
    * every cell (the reference skips the block).
    *
    * Scale: two scalar min/max aggregates (broadcast), one
    * marker-pruned per-cell aggregate, then a narrow projection.
    */
  def malignantScores(
      cnv: DataFrame, expr: DataFrame, types: DataFrame,
      cellCol: String, geneCol: String, valueCol: String,
      typeCol: String, cancerMarkers: Seq[String],
      immuneTypes: Seq[String]): DataFrame = {
    val present = expr.select(col(geneCol)).distinct()
      .where(col(geneCol).isin(cancerMarkers: _*))
    val m = present.agg(count(lit(1)).cast("double").as("n_markers"))
    val markerSums = expr.join(broadcast(present), Seq(geneCol))
      .groupBy(col(cellCol)).agg(sum(col(valueCol)).as("smk"))
    val withMk = cnv.join(markerSums, Seq(cellCol), "left")
      .crossJoin(broadcast(m))
      .withColumn("mk", when(col("n_markers") > 0.0,
        r6(coalesce(col("smk"), lit(0.0)) / col("n_markers")))
        .otherwise(lit(0.0)))
    val ranges = withMk.agg(
      min(col("cnv_score")).as("cmin"), max(col("cnv_score")).as("cmax"),
      min(col("mk")).as("mmin"), max(col("mk")).as("mmax"))
    val isImmune = immuneTypes
      .map(t => instr(lower(col(typeCol)), t.toLowerCase) > 0)
      .reduce(_ || _)
    withMk.crossJoin(broadcast(ranges))
      .join(types, Seq(cellCol))
      .withColumn("cnvn", r6((col("cnv_score") - col("cmin")) /
        (col("cmax") - col("cmin") + 1e-10)))
      .withColumn("mkn", when(col("n_markers") > 0.0,
        r6((col("mk") - col("mmin")) /
          (col("mmax") - col("mmin") + 1e-10))).otherwise(lit(0.0)))
      .withColumn("malignant_score", r6(lit(0.5) * col("cnvn") +
        lit(0.3) * col("mkn") +
        when(isImmune, lit(0.0)).otherwise(lit(0.2))))
      .withColumn("is_malignant", col("malignant_score") > 0.5)
      .select(col(cellCol), col(typeCol), col("malignant_score"),
        col("is_malignant"))
  }
}
