package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** News prioritization — re-expression of the reference's daily-
  * briefing prioritizer (reference:
  * bio-daily-briefing/src/prioritizer.py:95 calculate_priority —
  * additive source/type weights plus keyword / company / journal /
  * breakthrough / recency bonuses; :240 categorize_news — source→
  * category mapping; :169 select_headline — a fixed category/type
  * priority ladder that returns the best item of the first non-empty
  * rung).
  *
  * Scale shape: every scoring input is a per-row column expression
  * (whole-stage codegen, no shuffle); the headline ladder is a rank
  * column plus a global top-1 (TakeOrderedAndProject), so the
  * operator streams over an arbitrarily large news corpus with no
  * wide exchange at all.
  */
object Newsroom {

  /** One scoring panel = the prioritizer's five weight tables.
    * Keyword/company/journal matching is substring containment over
    * lowercased text, exactly like the reference's `in text` checks
    * (prioritizer.py:116-131); each bonus fires at most once
    * (`break` in the reference loop).
    */
  case class NewsPanel(
      sourceWeights: Map[String, Int], sourceDefault: Int,
      typeWeights: Map[String, Int], typeDefault: Int,
      hotKeywords: Seq[String], hotBonus: Int,
      companies: Seq[String], companyBonus: Int,
      journals: Seq[String], journalBonus: Int,
      breakthroughTerms: Seq[String], breakthroughBonus: Int)

  /** The reference's weight tables verbatim (prioritizer.py:34-61),
    * used by specs; demo bindings remap onto the synthetic corpus.
    */
  val ReferencePanel: NewsPanel = NewsPanel(
    sourceWeights = Map("FDA" -> 100, "ClinicalTrials" -> 80,
      "PubMed" -> 60, "bioRxiv" -> 50, "medRxiv" -> 50),
    sourceDefault = 20,
    typeWeights = Map(
      "drug_approval" -> 150, "biologics_approval" -> 150,
      "rejection" -> 120, "safety_warning" -> 130, "designation" -> 80,
      "phase3_positive" -> 140, "phase3_negative" -> 130,
      "phase3_completed" -> 100, "new_trial" -> 70, "stopped" -> 110,
      "research" -> 50, "preprint" -> 40),
    typeDefault = 10,
    hotKeywords = Seq("glp-1", "crispr", "car-t", "mrna"), hotBonus = 30,
    companies = Seq("pfizer", "novartis", "roche"), companyBonus = 25,
    journals = Seq("nature", "science", "cell", "lancet"),
    journalBonus = 40,
    breakthroughTerms = Seq("first", "breakthrough", "novel"),
    breakthroughBonus = 50)

  private def mapWeight(
      c: Column, weights: Map[String, Int], default: Int): Column =
    weights.toSeq.sortBy(_._1).foldLeft(lit(default): Column) {
      case (acc, (k, v)) => when(c === lit(k), lit(v)).otherwise(acc)
    }

  private def anyContains(text: Column, terms: Seq[String]): Column =
    terms.map(t => text.contains(lit(t))).reduce(_ || _)

  /** Per-item priority score (prioritizer.py:95). Expects columns:
    * `newsSourceCol` (source name), `newsTypeCol` (news type),
    * `textCol` (title+summary, lowercased by the caller or here),
    * `journalCol` (journal name, lowercase), `daysOldCol`
    * (integer days since publication — the reference derives it
    * from the date string; the binding synthesizes it).
    * Adds `priority_score`.
    */
  def priorityScore(
      news: DataFrame, newsSourceCol: String, newsTypeCol: String,
      textCol: String, journalCol: String, daysOldCol: String,
      panel: NewsPanel): DataFrame = {
    val text = lower(col(textCol))
    val score =
      mapWeight(col(newsSourceCol), panel.sourceWeights,
        panel.sourceDefault) +
      mapWeight(col(newsTypeCol), panel.typeWeights, panel.typeDefault) +
      when(anyContains(text, panel.hotKeywords), panel.hotBonus)
        .otherwise(0) +
      when(anyContains(lower(col(journalCol)), panel.journals),
        panel.journalBonus).otherwise(0) +
      when(anyContains(text, panel.companies), panel.companyBonus)
        .otherwise(0) +
      when(anyContains(text, panel.breakthroughTerms),
        panel.breakthroughBonus).otherwise(0) +
      // recency tiers (prioritizer.py:138-146)
      when(col(daysOldCol) === 0, 30)
        .when(col(daysOldCol) <= 1, 20)
        .when(col(daysOldCol) <= 3, 10)
        .otherwise(0)
    news.withColumn("priority_score", score.cast("long"))
  }

  /** Source/type → category (prioritizer.py:240 categorize_news):
    * FDA→regulatory, ClinicalTrials→clinical, bioRxiv/medRxiv or a
    * 'preprint' type→preprints, everything else→research.
    */
  def categorize(
      news: DataFrame, newsSourceCol: String, newsTypeCol: String): DataFrame =
    news.withColumn("category",
      when(col(newsSourceCol) === "FDA", "regulatory")
        .when(col(newsSourceCol) === "ClinicalTrials", "clinical")
        .when(col(newsSourceCol).isin("bioRxiv", "medRxiv"), "preprints")
        .when(lower(col(newsTypeCol)).contains("preprint"), "preprints")
        .otherwise("research"))

  /** Headline-ladder rung per item (select_headline, prioritizer
    * .py:169): 1 regulatory approvals, 2 regulatory warnings/safety/
    * rejections, 3 phase-3 positives, 4 any clinical, 5 any research,
    * 6 any preprint, 7 any regulatory fallback. An item's rung is the
    * FIRST ladder stage it satisfies; the headline is the
    * highest-priority item of the lowest non-empty rung.
    */
  def headlineRung(newsTypeCol: String, categoryCol: String): Column = {
    val t = lower(col(newsTypeCol))
    val cat = col(categoryCol)
    when(cat === "regulatory" && t.contains("approval"), 1)
      .when(cat === "regulatory" &&
        (t.contains("warning") || t.contains("safety") ||
          t.contains("reject")), 2)
      .when(cat === "clinical" && t.contains("positive"), 3)
      .when(cat === "clinical", 4)
      .when(cat === "research", 5)
      .when(cat === "preprints", 6)
      .when(cat === "regulatory", 7)
      .otherwise(8)
  }

  /** The selected headline: global top-1 by (rung asc, score desc,
    * id asc) — a TakeOrderedAndProject, never a full sort.
    */
  def selectHeadline(
      scored: DataFrame, idCol: String, newsTypeCol: String,
      categoryCol: String): DataFrame =
    scored
      .withColumn("rung", headlineRung(newsTypeCol, categoryCol)
        .cast("long"))
      .orderBy(col("rung"), col("priority_score").desc, col(idCol))
      .limit(1)
}
