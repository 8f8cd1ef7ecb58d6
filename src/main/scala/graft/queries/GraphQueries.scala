package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.KnowledgeGraph

/** Knowledge-graph route bound to the synthetic corpus (reference:
  * backend/app/api/routes/graph.py). The domain keyword panel is a
  * 12-entry corpus-vocabulary stand-in mixing single words
  * (word-boundary matched) and bigrams (substring matched); the
  * node-type ladder's term lists are chosen so all eight type rungs
  * plus the 'keyword' fallback fire at sf0.01.
  */
object GraphQueries {

  /** Panel: 8 single words + 4 bigrams (graph.py DOMAIN_KEYWORDS
    * stand-in).
    */
  private val Panel = Seq(
    "spark", "stream", "window", "vector", "batch", "dup", "filter",
    "sort", "hash join", "merge sort", "slow scan", "key value")

  private val Types = KnowledgeGraph.TypePanel(
    genePatterns = Seq("spark", "hash"),
    diseaseTerms = Seq("slow", "dup"),
    pathwayTerms = Seq("stream", "window"),
    treatmentTerms = Seq("merge", "sort"),
    biomarkerTerms = Seq("vector"),
    proteinTerms = Seq("filter"),
    mechanismTerms = Seq("batch"))

  private def kwDocs(s: SparkSession, d: String): DataFrame =
    KnowledgeGraph.keywordDocs(
      Tables.documents(s, d), "doc_id", "text", Panel)

  /** Shared oracle CTEs: panel VALUES + the (doc, keyword) matches
    * + per-keyword counts, generated from the same constants as the
    * Spark binding.
    */
  private val kgCtes = {
    val values = Panel.map { kw =>
      s"('$kw', ${kw.contains(" ")})"
    }.mkString(", ")
    s"""kw(k, multi) AS (VALUES $values),
       |kd AS (
       |  SELECT doc_id, k AS keyword
       |  FROM documents, kw
       |  WHERE CASE WHEN multi THEN contains(text, k)
       |    ELSE regexp_matches(text, '\\b' || k || '\\b') END),
       |n AS (
       |  SELECT keyword, count(*)::BIGINT AS occurrences
       |  FROM kd GROUP BY 1)""".stripMargin
  }

  private def caseContains(terms: Seq[String], t: String): String =
    terms.map(w => s"contains(lower(keyword), '$w')").mkString(" OR ")
      .pipe(c => s"WHEN $c THEN '$t'")

  private implicit class Piper[A](private val a: A) {
    def pipe[B](f: A => B): B = f(a)
  }

  /* ---------------- kg_nodes ---------------- */

  private def kgNodes(s: SparkSession, d: String): DataFrame =
    KnowledgeGraph.nodes(kwDocs(s, d), "doc_id", Types,
        minConnections = 2)
      .orderBy(col("occurrences").desc, col("keyword"))

  private val kgNodesSql = {
    val ladder = Seq(
      caseContains(Types.genePatterns, "gene"),
      caseContains(Types.diseaseTerms, "disease"),
      caseContains(Types.pathwayTerms, "pathway"),
      caseContains(Types.treatmentTerms, "treatment"),
      caseContains(Types.biomarkerTerms, "biomarker"),
      caseContains(Types.proteinTerms, "protein"),
      caseContains(Types.mechanismTerms, "mechanism")).mkString("\n    ")
    s"""WITH $kgCtes
       |SELECT keyword, occurrences,
       |  CASE
       |    WHEN keyword = upper(keyword) AND length(keyword) <= 10
       |      AND regexp_matches(keyword, '[A-Z]') THEN 'gene'
       |    $ladder
       |    ELSE 'keyword' END AS node_type,
       |  least(0.5 + occurrences * 0.5, 5.0) AS size
       |FROM n
       |WHERE occurrences >= 2
       |ORDER BY occurrences DESC, keyword""".stripMargin
  }

  /* ---------------- kg_links ---------------- */

  private def kgLinks(s: SparkSession, d: String): DataFrame =
    KnowledgeGraph.links(kwDocs(s, d), "doc_id", minConnections = 2)
      .orderBy(col("strength").desc, col("kw1"), col("kw2"))

  private val kgLinksSql =
    s"""WITH $kgCtes,
       |f AS (SELECT * FROM n WHERE occurrences >= 2),
       |l AS (
       |  SELECT a.keyword AS kw1, b.keyword AS kw2,
       |    count(*)::BIGINT AS common_papers
       |  FROM kd a JOIN kd b
       |    ON a.doc_id = b.doc_id AND a.keyword < b.keyword
       |  GROUP BY 1, 2)
       |SELECT kw1, kw2, common_papers,
       |  round(common_papers / greatest(n1.occurrences, n2.occurrences)
       |    + 1e-9, 4) AS strength
       |FROM l
       |JOIN f n1 ON l.kw1 = n1.keyword
       |JOIN f n2 ON l.kw2 = n2.keyword
       |ORDER BY strength DESC, kw1, kw2""".stripMargin

  val defs: Seq[Qdef] = Seq(
    Qdef("kg_nodes", kgNodes, Some(kgNodesSql)),
    Qdef("kg_links", kgLinks, Some(kgLinksSql)))
}
