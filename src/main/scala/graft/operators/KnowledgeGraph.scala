package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword co-occurrence knowledge graph — re-expression of the
  * reference's graph route (reference:
  * backend/app/api/routes/graph.py:162 extract_keywords — per-domain
  * keyword panel matched with substring containment for multi-word
  * terms and word-boundary regex for single words; :182
  * get_node_type — first-match classification ladder; :247
  * get_knowledge_graph — keyword nodes sized by occurrence count and
  * keyword-keyword links with strength = |common papers| /
  * max(|papers₁|, |papers₂|)).
  *
  * Scale shape: the panel is a bounded literal (domain keyword sets
  * are curated), so matching is |docs|×|panel| codegen'd predicates —
  * no corpus join. Nodes are one map-side-combined groupBy on the
  * keyword key (panel-sized result). Links self-join the (doc,
  * keyword) pairs on the DOC key — each doc contributes at most
  * |panel|² local pairs — then aggregate on the pair key into a
  * panel²-bounded frame; per-keyword totals ride back in via a
  * broadcast join. The reference's driver-side dict-of-sets loop
  * becomes two shuffles whose results are panel-bounded, never
  * corpus-bounded.
  */
object KnowledgeGraph {

  /** Node-type term lists, checked in the reference's ladder order
    * (graph.py:182): uppercase-short → gene, then gene patterns,
    * disease, pathway, treatment, biomarker, protein, mechanism,
    * else 'keyword'. All checks are substring containment over the
    * lowercased keyword, like the reference.
    */
  case class TypePanel(
      genePatterns: Seq[String], diseaseTerms: Seq[String],
      pathwayTerms: Seq[String], treatmentTerms: Seq[String],
      biomarkerTerms: Seq[String], proteinTerms: Seq[String],
      mechanismTerms: Seq[String])

  /** (doc, keyword) match pairs: multi-word panel entries match by
    * substring, single words by word-boundary regex (graph.py:168).
    */
  def keywordDocs(
      docs: DataFrame, idCol: String, textCol: String,
      panel: Seq[String]): DataFrame = {
    val hits = panel.map { kw =>
      val cond =
        if (kw.contains(" ")) col(textCol).contains(kw)
        else col(textCol).rlike("\\b" + java.util.regex.Pattern.quote(kw)
          + "\\b")
      struct(lit(kw).as("keyword"), cond.as("hit"))
    }
    docs.select(col(idCol), explode(array(hits: _*)).as("h"))
      .where(col("h.hit"))
      .select(col(idCol), col("h.keyword").as("keyword"))
  }

  private def containsAny(c: Column, terms: Seq[String]): Column =
    terms.map(t => c.contains(lit(t))).reduce(_ || _)

  /** The get_node_type ladder as a column over the keyword. */
  def nodeType(keyword: Column, panel: TypePanel): Column = {
    val k = lower(keyword)
    when(keyword === upper(keyword) && length(keyword) <= 10 &&
        keyword.rlike("[A-Z]"), "gene")
      .when(containsAny(k, panel.genePatterns), "gene")
      .when(containsAny(k, panel.diseaseTerms), "disease")
      .when(containsAny(k, panel.pathwayTerms), "pathway")
      .when(containsAny(k, panel.treatmentTerms), "treatment")
      .when(containsAny(k, panel.biomarkerTerms), "biomarker")
      .when(containsAny(k, panel.proteinTerms), "protein")
      .when(containsAny(k, panel.mechanismTerms), "mechanism")
      .otherwise("keyword")
  }

  /** Keyword nodes: occurrence counts (≥ minConnections, the route's
    * min_connections filter), the type ladder, and the display size
    * min(0.5 + n·0.5, 5.0) (graph.py:322).
    */
  def nodes(
      kwDocs: DataFrame, idCol: String, panel: TypePanel,
      minConnections: Long = 1): DataFrame =
    kwDocs.groupBy(col("keyword"))
      .agg(count(lit(1)).as("occurrences"))
      .where(col("occurrences") >= minConnections)
      .select(col("keyword"), col("occurrences"),
        nodeType(col("keyword"), panel).as("node_type"),
        least(lit(0.5) + col("occurrences") * 0.5, lit(5.0)).as("size"))

  /** Keyword-keyword co-occurrence links (graph.py:352): for each
    * unordered pair sharing ≥1 doc, strength = |common| /
    * max(|docs₁|, |docs₂|). Both keywords must survive the
    * minConnections node filter, like the route's filtered_keywords.
    */
  def links(
      kwDocs: DataFrame, idCol: String,
      minConnections: Long = 1): DataFrame = {
    val counts = kwDocs.groupBy(col("keyword"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minConnections)
    val kd = kwDocs.join(broadcast(counts), Seq("keyword"))
    val a = kd.select(col(idCol), col("keyword").as("kw1"),
      col("n").as("n1"))
    val b = kd.select(col(idCol), col("keyword").as("kw2"),
      col("n").as("n2"))
    a.join(b, Seq(idCol))
      .where(col("kw1") < col("kw2"))
      .groupBy(col("kw1"), col("kw2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("common_papers"))
      .select(col("kw1"), col("kw2"), col("common_papers"),
        round(col("common_papers") / greatest(col("n1"), col("n2"))
          + lit(1e-9), 4).as("strength"))
  }
}
