package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Citation-aware paper recommendation — re-expression of the
  * reference's enhanced recommender (reference:
  * rnaseq_pipeline/rag/paper_recommender.py:552
  * _calculate_quality_score — citation/velocity/recency piecewise
  * ladders; :616 _classify_paper_type — classic/breakthrough
  * precedence ladder; :667 _passes_quality_gate — per-type field
  * thresholds; :778 recommend_papers_enhanced — quality filter +
  * 50:50 classic/breakthrough balancing with best-available fill).
  * The reference fetches candidates and citation counts over HTTP;
  * here both arrive as columns and every stage is a per-row
  * codegen'd projection except the final balanced selection, which
  * windows over the (bounded, search-width-sized) candidate set.
  *
  * Scale shape: scoring/classification/gating are narrow. The
  * balanced pick runs two row_number windows over the filtered
  * candidates plus a broadcast scalar count for the fill quota —
  * candidate sets are max_papers×6 wide in the reference, so the
  * windows never see unbounded data at any corpus size.
  */
object Recommender {

  /** Citation velocity (paper_recommender.py:155 __post_init__):
    * citations per year of age, floored at 1 year; zero when the
    * paper has no citations.
    */
  def citationVelocity(
      citations: Column, year: Column, currentYear: Int): Column =
    when(citations > 0,
      citations.cast("double") /
        greatest(lit(1), lit(currentYear) - year))
      .otherwise(0.0)

  /** Citation score 0-40 (paper_recommender.py:563) — the same
    * piecewise ladder as the citation ranker script's.
    */
  def citationScore(citations: Column): Column = {
    val c = citations.cast("double")
    when(c <= 0, 0.0)
      .when(c < 10, c * 2)
      .when(c < 100, lit(20.0) + (c - 10) * 0.11)
      .when(c < 1000, lit(30.0) + (c - 100) * 0.011)
      .otherwise(40.0)
  }

  /** Velocity score 0-30 (paper_recommender.py:576). */
  def velocityScore(velocity: Column): Column = {
    val v = velocity.cast("double")
    when(v <= 0, 0.0)
      .when(v < 5, v * 2)
      .when(v < 20, lit(10.0) + (v - 5) * 0.67)
      .when(v < 50, lit(20.0) + (v - 20) * 0.33)
      .otherwise(30.0)
  }

  /** Recency score 0-30 (paper_recommender.py:590): age buckets
    * 30/27/24/20/15 then max(5, 15-(age-10)).
    */
  def recencyScore(year: Column, currentYear: Int): Column = {
    val age = (lit(currentYear) - year).cast("double")
    when(age <= 1, 30.0).when(age <= 2, 27.0).when(age <= 3, 24.0)
      .when(age <= 5, 20.0).when(age <= 10, 15.0)
      .otherwise(greatest(lit(5.0), lit(15.0) - (age - 10)))
  }

  /** Paper-type precedence ladder (paper_recommender.py:616):
    * uncited -> unknown; age>=3 & >=50 cites -> classic, >=30 ->
    * likely_classic; age<=2 & ((>=10 cites & velocity>=5) or >=3
    * influential) -> breakthrough; 1<=age<=3 & >=5 cites &
    * velocity>=3 -> likely_breakthrough; else unknown.
    */
  def classifyPaperType(
      citations: Column, velocity: Column, influential: Column,
      year: Column, currentYear: Int): Column = {
    val age = lit(currentYear) - year
    when(citations <= 0, "unknown")
      .when(age >= 3 && citations >= 50, "classic")
      .when(age >= 3 && citations >= 30, "likely_classic")
      .when(age <= 2 &&
        ((citations >= 10 && velocity >= 5) || influential >= 3),
        "breakthrough")
      .when(age >= 1 && age <= 3 && citations >= 5 && velocity >= 3,
        "likely_breakthrough")
      .otherwise("unknown")
  }

  /** Per-type quality gate (paper_recommender.py:667): classics
    * need the field's citation threshold (likely 50% of it),
    * breakthroughs the field's velocity (likely 50%), unknowns 20
    * cites or velocity 10.
    */
  def passesQualityGate(
      paperType: Column, citations: Column, velocity: Column,
      classicThreshold: Double, breakthroughVelocity: Double): Column =
    when(paperType === "classic", citations >= classicThreshold)
      .when(paperType === "likely_classic",
        citations >= classicThreshold * 0.5)
      .when(paperType === "breakthrough",
        velocity >= breakthroughVelocity)
      .when(paperType === "likely_breakthrough",
        velocity >= breakthroughVelocity * 0.5)
      .otherwise(citations >= 20 || velocity >= 10)

  /** Estimated quality when citation data is unavailable
    * (paper_recommender.py:691): base 50, +30 for a high-impact
    * journal, then +5 if age<=2 else +10 for age>=5 papers already
    * at >=70 (i.e. with the journal bonus), capped at 100; the type
    * stays unknown — the reference refuses to call a paper classic
    * or breakthrough without citations.
    */
  def estimatedQuality(
      highImpactJournal: Column, year: Column, currentYear: Int): Column = {
    val age = lit(currentYear) - year
    val base = lit(50.0) + when(highImpactJournal, 30.0).otherwise(0.0)
    least(lit(100.0),
      base + when(age <= 2, 5.0)
        .when(age >= 5 && base >= 70, 10.0)
        .otherwise(0.0))
  }

  /** Quality filter + 50:50 balanced selection
    * (paper_recommender.py:893-940): keep candidates passing the
    * gate or scoring >=60, take the top maxPapers/2 classics and
    * top maxPapers/2 breakthroughs by quality, then fill the
    * remaining slots with the best unselected candidates. The
    * reference's stable Python sort is pinned to a (quality desc,
    * id) tie-break. Output carries the selection bucket (0 classics,
    * 1 breakthroughs, 2 fill) and the within-bucket rank, matching
    * the reference's result-list order.
    *
    * Expects columns: `idCol`, paper_type, quality_score,
    * passes_gate.
    */
  def balancedSelect(
      papers: DataFrame, idCol: String, maxPapers: Int): DataFrame = {
    val half = maxPapers / 2
    val kept = papers
      .where(col("passes_gate") || col("quality_score") >= 60)
    val byQuality = Window.partitionBy(col("bucket"))
      .orderBy(col("quality_score").desc, col(idCol))
    val bucketed = kept.withColumn("bucket",
      when(col("paper_type").isin("classic", "likely_classic"), 0)
        .when(col("paper_type")
          .isin("breakthrough", "likely_breakthrough"), 1)
        .otherwise(2))
    val ranked = bucketed
      .withColumn("brn", row_number().over(byQuality))
    val selected = ranked
      .where(col("bucket") =!= 2 && col("brn") <= half)
    // fill quota = maxPapers - |selected|: a single scalar,
    // broadcast back over the leftovers (never a driver collect)
    val quota = selected.agg(
      (lit(maxPapers) - count(lit(1))).cast("int").as("quota"))
    val leftovers = ranked
      .where(col("bucket") === 2 || col("brn") > half)
      .withColumn("frn", row_number().over(Window
        .orderBy(col("quality_score").desc, col(idCol))))
    val fill = leftovers.crossJoin(broadcast(quota))
      .where(col("frn") <= col("quota"))
      .withColumn("bucket", lit(2)).withColumn("brn", col("frn"))
      .drop("frn", "quota")
    selected.unionByName(fill)
      .orderBy(col("bucket"), col("brn"))
  }
}
