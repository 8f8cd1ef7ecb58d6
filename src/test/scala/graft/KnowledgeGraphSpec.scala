package graft

import org.apache.spark.sql.functions._

import graft.operators.KnowledgeGraph
import graft.operators.KnowledgeGraph.TypePanel

/** Unit specs for the knowledge-graph extraction, type ladder and
  * co-occurrence strength — including the isupper gene rung the
  * lowercase corpus binding never reaches.
  */
class KnowledgeGraphSpec extends SparkSpec {
  import spark.implicits._

  private val panel = TypePanel(
    genePatterns = Seq("kras"), diseaseTerms = Seq("cancer"),
    pathwayTerms = Seq("signaling"), treatmentTerms = Seq("therapy"),
    biomarkerTerms = Seq("marker"), proteinTerms = Seq("kinase"),
    mechanismTerms = Seq("apoptosis"))

  test("keywordDocs: bigrams by substring, single words by boundary") {
    val docs = Seq(
      (1L, "gene therapy resorts to sorting"), // 'gene therapy' bigram
      (2L, "sort of a sorted sorting test"),   // 'sort' only as word
      (3L, "gene therapyx near miss")          // substring still hits
    ).toDF("doc_id", "text")
    val out = KnowledgeGraph.keywordDocs(docs, "doc_id", "text",
        Seq("gene therapy", "sort"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // doc 1: bigram yes; 'sort' appears only inside 'resorts'/'sorting'
    // → boundary match fails
    // doc 2: 'sort' as a word; doc 3: substring bigram match
    assert(out == Set((1L, "gene therapy"), (2L, "sort"),
      (3L, "gene therapy")))
  }

  test("nodeType ladder: isupper-short gene rung fires before term lists") {
    val out = Seq("KRAS", "TP53", "VERYLONGGENENAME", "cancer therapy",
      "tgf signaling", "cd8 marker", "jak kinase", "apoptosis", "misc")
      .toDF("kw")
      .select(col("kw"), KnowledgeGraph.nodeType(col("kw"), panel)
        .as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("KRAS") == "gene")   // isupper ≤10
    assert(out("TP53") == "gene")
    assert(out("VERYLONGGENENAME") == "keyword") // isupper but >10
    // first-match precedence: 'cancer therapy' hits disease BEFORE
    // treatment (reference checks disease_terms first)
    assert(out("cancer therapy") == "disease")
    assert(out("tgf signaling") == "pathway")
    assert(out("cd8 marker") == "biomarker")
    assert(out("jak kinase") == "protein")
    assert(out("apoptosis") == "mechanism")
    assert(out("misc") == "keyword")
  }

  test("links: strength = common / max(n1, n2); min_connections filters") {
    // kw a in docs {1,2,3}; kw b in {2,3}; kw c in {3} (below min 2)
    val kd = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"),
      (2L, "b"), (3L, "b"),
      (3L, "c")).toDF("doc_id", "keyword")
    val out = KnowledgeGraph.links(kd, "doc_id", minConnections = 2)
      .collect()
    assert(out.length == 1) // c dropped by the node filter
    val r = out.head
    assert(r.getAs[String]("kw1") == "a" && r.getAs[String]("kw2") == "b")
    assert(r.getAs[Long]("common_papers") == 2L)
    assert(r.getAs[Double]("strength") == 0.6667) // round(2/3, 4)
  }

  test("nodes: size saturates at 5.0 and respects min_connections") {
    val kd = (1L to 12L).map(i => (i, "big")).toDF("doc_id", "keyword")
      .union(Seq((1L, "small")).toDF("doc_id", "keyword"))
    val out = KnowledgeGraph.nodes(kd, "doc_id", panel,
        minConnections = 2)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("size") == 5.0)
    val all = KnowledgeGraph.nodes(kd, "doc_id", panel).collect()
      .map(r => r.getAs[String]("keyword") ->
        r.getAs[Double]("size")).toMap
    assert(all("small") == 1.0) // 0.5 + 1·0.5
  }

  test("kg_links plan: per-keyword totals broadcast, pair agg partial") {
    val df = SparkEntry.queries("kg_links")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(df.count() > 0)
  }
}
