package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Newsroom

/** Daily-briefing prioritization bound to the synthetic corpus
  * (reference: bio-daily-briefing/src/prioritizer.py). The news
  * attributes the reference reads from its fetchers are synthesized
  * deterministically: src0-4 play the five named sources, the twelve
  * reference news types cycle by doc_id, the journal rotates through
  * a 7-slot panel (3 high-impact), and days_old cycles 0-5 so every
  * recency tier fires. Scoring panels are corpus bigrams chosen so
  * each bonus splits the corpus (~5-15% hit rates).
  */
object NewsQueries {

  /** The twelve reference news types, in weight-table order
    * (prioritizer.py:44-60); index = doc_id % 12.
    */
  private val NewsTypes = Seq(
    "drug_approval", "biologics_approval", "rejection", "safety_warning",
    "designation", "phase3_positive", "phase3_negative",
    "phase3_completed", "new_trial", "stopped", "research", "preprint")

  /** 7-slot journal rotation; slots 0-2 contain a high-impact
    * substring ("nature"/"science"/"cell"), slots 3-6 do not.
    */
  private val Journals = Seq(
    "nature medicine", "science advances", "cell reports",
    "archive letters", "field notes", "working papers",
    "preprint server")

  /** Corpus-vocabulary stand-ins for the reference's keyword panels
    * (hot keywords / big pharma / high-impact journals / first-or-
    * breakthrough terms, prioritizer.py:63-93). Bigrams hit ~5-8% of
    * docs each; 'dup' hits 5%.
    */
  private val DemoPanel = Newsroom.NewsPanel(
    sourceWeights = Newsroom.ReferencePanel.sourceWeights,
    sourceDefault = 20,
    typeWeights = Newsroom.ReferencePanel.typeWeights,
    typeDefault = 10,
    hotKeywords = Seq("slow scan", "hash join", "stream window"),
    hotBonus = 30,
    companies = Seq("merge sort", "vector scan"), companyBonus = 25,
    journals = Seq("nature", "science", "cell", "lancet"),
    journalBonus = 40,
    breakthroughTerms = Seq("dup"), breakthroughBonus = 50)

  /** Documents enriched with the synthesized news attributes. */
  private def newsDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), col("text"),
      when(col("source") === "src0", "FDA")
        .when(col("source") === "src1", "ClinicalTrials")
        .when(col("source") === "src2", "PubMed")
        .when(col("source") === "src3", "bioRxiv")
        .when(col("source") === "src4", "medRxiv")
        .otherwise(col("source")).as("news_source"),
      element_at(
        array(NewsTypes.map(lit): _*),
        (pmod(col("doc_id"), lit(12)) + 1).cast("int")).as("news_type"),
      element_at(
        array(Journals.map(lit): _*),
        (pmod(col("doc_id"), lit(7)) + 1).cast("int")).as("journal"),
      pmod(col("doc_id"), lit(6)).as("days_old"))

  /** Shared oracle CTE mirroring [[newsDocs]] + the scoring sum. */
  private val newsSqlCtes = {
    val typeCase = NewsTypes.zipWithIndex
      .map { case (t, i) => s"WHEN $i THEN '$t'" }.mkString(" ")
    val journalCase = Journals.zipWithIndex
      .map { case (j, i) => s"WHEN $i THEN '$j'" }.mkString(" ")
    val typeWeightCase = Newsroom.ReferencePanel.typeWeights.toSeq.sorted
      .map { case (t, w) => s"WHEN '$t' THEN $w" }.mkString(" ")
    s"""nd AS (
       |  SELECT doc_id, text,
       |    CASE source WHEN 'src0' THEN 'FDA'
       |      WHEN 'src1' THEN 'ClinicalTrials'
       |      WHEN 'src2' THEN 'PubMed' WHEN 'src3' THEN 'bioRxiv'
       |      WHEN 'src4' THEN 'medRxiv' ELSE source END AS news_source,
       |    CASE doc_id % 12 $typeCase END AS news_type,
       |    CASE doc_id % 7 $journalCase END AS journal,
       |    doc_id % 6 AS days_old
       |  FROM documents),
       |ns AS (
       |  SELECT doc_id, news_source, news_type, days_old,
       |    (CASE news_source WHEN 'FDA' THEN 100
       |       WHEN 'ClinicalTrials' THEN 80 WHEN 'PubMed' THEN 60
       |       WHEN 'bioRxiv' THEN 50 WHEN 'medRxiv' THEN 50
       |       ELSE 20 END
       |     + CASE news_type $typeWeightCase ELSE 10 END
       |     + CASE WHEN contains(text, 'slow scan')
       |         OR contains(text, 'hash join')
       |         OR contains(text, 'stream window') THEN 30 ELSE 0 END
       |     + CASE WHEN contains(journal, 'nature')
       |         OR contains(journal, 'science')
       |         OR contains(journal, 'cell')
       |         OR contains(journal, 'lancet') THEN 40 ELSE 0 END
       |     + CASE WHEN contains(text, 'merge sort')
       |         OR contains(text, 'vector scan') THEN 25 ELSE 0 END
       |     + CASE WHEN contains(text, 'dup') THEN 50 ELSE 0 END
       |     + CASE WHEN days_old = 0 THEN 30 WHEN days_old <= 1 THEN 20
       |         WHEN days_old <= 3 THEN 10 ELSE 0 END
       |    )::BIGINT AS priority_score,
       |    CASE WHEN news_source = 'FDA' THEN 'regulatory'
       |      WHEN news_source = 'ClinicalTrials' THEN 'clinical'
       |      WHEN news_source IN ('bioRxiv', 'medRxiv') THEN 'preprints'
       |      WHEN contains(lower(news_type), 'preprint') THEN 'preprints'
       |      ELSE 'research' END AS category
       |  FROM nd)""".stripMargin
  }

  private def scoredNews(s: SparkSession, d: String): DataFrame = {
    val scored = Newsroom.priorityScore(
      newsDocs(s, d), "news_source", "news_type", "text", "journal",
      "days_old", DemoPanel)
    Newsroom.categorize(scored, "news_source", "news_type")
  }

  /* ---------------- news_priority ---------------- */

  private def newsPriority(s: SparkSession, d: String): DataFrame =
    scoredNews(s, d)
      .select(col("doc_id"), col("news_source"), col("news_type"),
        col("category"), col("priority_score"))
      .orderBy(col("priority_score").desc, col("doc_id"))

  private val newsPrioritySql =
    s"""WITH $newsSqlCtes
       |SELECT doc_id, news_source, news_type, category, priority_score
       |FROM ns
       |ORDER BY priority_score DESC, doc_id""".stripMargin

  /* ---------------- news_headline ---------------- */

  private def newsHeadline(s: SparkSession, d: String): DataFrame =
    Newsroom.selectHeadline(scoredNews(s, d), "doc_id", "news_type",
        "category")
      .select(col("doc_id"), col("category"), col("news_type"),
        col("rung"), col("priority_score"))

  private val newsHeadlineSql =
    s"""WITH $newsSqlCtes,
       |nr AS (
       |  SELECT *,
       |    (CASE
       |       WHEN category = 'regulatory'
       |         AND contains(lower(news_type), 'approval') THEN 1
       |       WHEN category = 'regulatory'
       |         AND (contains(lower(news_type), 'warning')
       |           OR contains(lower(news_type), 'safety')
       |           OR contains(lower(news_type), 'reject')) THEN 2
       |       WHEN category = 'clinical'
       |         AND contains(lower(news_type), 'positive') THEN 3
       |       WHEN category = 'clinical' THEN 4
       |       WHEN category = 'research' THEN 5
       |       WHEN category = 'preprints' THEN 6
       |       WHEN category = 'regulatory' THEN 7
       |       ELSE 8 END)::BIGINT AS rung
       |  FROM ns)
       |SELECT doc_id, category, news_type, rung, priority_score
       |FROM nr
       |ORDER BY rung, priority_score DESC, doc_id
       |LIMIT 1""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("news_priority", newsPriority, Some(newsPrioritySql)),
    Qdef("news_headline", newsHeadline, Some(newsHeadlineSql)))
}
