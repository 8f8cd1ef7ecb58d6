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

  /* ---------------- kg_communities ---------------- */

  private val LpaRounds = 6

  /** Community-detection binding: a deterministic clique-bridge graph
    * tiled over the doc-id space — each 6-id group forms two
    * triangles {0,1,2} / {3,4,5} joined by the 2-3 bridge, groups
    * disconnected — so LPA must SPLIT every group into its two
    * triangles (reachability would merge them). Trailing partial
    * groups degrade to chains/pairs; a 2-node pair oscillates under
    * synchronous updates with period 2, so after the fixed EVEN
    * round count both engines land on the same parity — the
    * determinism contract, not an accident.
    *
    * Oracle parity does not need the engine's early-stop mirrored:
    * a converged labeling is a fixpoint of the synchronous update,
    * so unrolling the full `LpaRounds` in SQL equals the engine's
    * stop-when-stable result whenever it converges sooner, and
    * matches round-for-round when it doesn't.
    */
  private def kgCommunities(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.documents(s, d).select(col("doc_id"))
    def shifted(ms: Seq[Int], delta: Int) = ids
      .where(pmod(col("doc_id"), lit(6)).isin(ms.map(_.toLong): _*))
      .select(col("doc_id").as("a"), (col("doc_id") + delta).as("b"))
    val raw = shifted(Seq(0, 1, 2, 3, 4), 1)
      .unionAll(shifted(Seq(0, 3), 2))
    // keep only edges whose far endpoint exists (trailing groups)
    val edges = raw.join(
      ids.withColumnRenamed("doc_id", "b"), Seq("b"))
      .select(col("a"), col("b"))
    graft.operators.Stats.labelPropagation(edges, "a", "b", LpaRounds)
      .orderBy(col("node"))
  }

  private val kgCommunitiesSql = {
    val rounds = (1 to LpaRounds).map { r =>
      s"""nl$r AS (SELECT e.src, l${r - 1}.label, count(*) AS cnt
         |  FROM e JOIN l${r - 1} ON e.dst = l${r - 1}.node
         |  GROUP BY 1, 2),
         |l$r AS (SELECT src AS node, label FROM (
         |    SELECT src, label, row_number() OVER (PARTITION BY src
         |      ORDER BY cnt DESC, label) AS rn FROM nl$r)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ids AS (SELECT doc_id FROM documents),
       |e0 AS (
       |  SELECT a.doc_id AS a, a.doc_id + 1 AS b FROM ids a
       |  WHERE a.doc_id % 6 IN (0, 1, 2, 3, 4)
       |  UNION ALL
       |  SELECT a.doc_id, a.doc_id + 2 FROM ids a
       |  WHERE a.doc_id % 6 IN (0, 3)),
       |e1 AS (SELECT e0.a, e0.b FROM e0 JOIN ids ON e0.b = ids.doc_id),
       |e AS (SELECT a AS src, b AS dst FROM e1
       |  UNION SELECT b, a FROM e1),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |$rounds,
       |sz AS (SELECT label, count(*)::BIGINT AS community_size
       |  FROM l$LpaRounds GROUP BY label)
       |SELECT lf.node, lf.label AS community, sz.community_size
       |FROM l$LpaRounds lf JOIN sz ON lf.label = sz.label
       |ORDER BY lf.node""".stripMargin
  }

  val defs: Seq[Qdef] = Seq(
    Qdef("kg_nodes", kgNodes, Some(kgNodesSql)),
    Qdef("kg_links", kgLinks, Some(kgLinksSql)),
    Qdef("kg_communities", kgCommunities, Some(kgCommunitiesSql)))
}
