package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Benchmark decontamination — flag training documents that overlap an
  * evaluation/benchmark set by shared word n-grams, the standard
  * pre-training hygiene step (GPT-3 appendix C / PaLM-style 8-13-gram
  * overlap checks). The reference's corpus builder has no equivalent;
  * this extends the engine's LLM-data-pipeline surface.
  *
  * Scale shape: the benchmark side is an eval suite — thousands of
  * documents, not terabytes — so its distinct n-gram set broadcasts
  * and the 100 TB corpus side streams through a broadcast hash join
  * with no corpus shuffle for the membership probe. The only wide
  * exchanges are the per-doc distinct + count aggregates, both keyed
  * by (doc, gram)/(doc) and map-side combined. N-grams come from the
  * native TokenShingles expression (codegen'd).
  */
object Decontam {

  /** Documents from `corpus` sharing ≥1 word n-gram with `bench`.
    * Output: (idCol, n_grams, hit_grams, contamination) — distinct
    * n-grams in the doc, distinct n-grams also present anywhere in
    * the benchmark set, and their ratio. Docs with zero overlap (or
    * fewer than n tokens, hence no n-grams) are absent.
    *
    * Caches the corpus gram frame (consumed by both the per-doc
    * total and the overlap probe) — caller owns the lifecycle, see
    * [[graft.Caching]].
    */
  def contaminated(
      corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    def grams(df: DataFrame) = df.select(
      explode(TextFns.shinglesOfTokens(
        TextFns.wsTokens(col(textCol)), n)).as("g"))
    val corpusGrams = corpus
      .select(col(idCol),
        explode(TextFns.shinglesOfTokens(
          TextFns.wsTokens(col(textCol)), n)).as("g"))
      .distinct()
      .cache()
    val benchGrams = grams(bench).distinct()
    val perDoc = corpusGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val hits = corpusGrams
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("hit_grams"))
    hits.join(perDoc, Seq(idCol))
      .select(col(idCol),
        col("n_grams").cast("long").as("n_grams"),
        col("hit_grams").cast("long").as("hit_grams"),
        round(col("hit_grams").cast("double") / col("n_grams") + lit(1e-9), 6)
          .as("contamination"))
  }
}
