package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Dynamic keyword discovery + growth analysis — re-expression of
  * the reference's dynamic-trends route (reference:
  * backend/app/api/routes/dynamic_trends.py:127
  * extract_keywords_from_text — uni/bi/trigram extraction with
  * stopword and priority-term rules; :161
  * filter_meaningful_keywords — count/length/stopword cuts with a
  * 2× priority boost; :326 discover endpoint — frequency ranking +
  * the rising/stable/new growth-signal ladder; :513
  * growth-analysis endpoint — two-period keyword growth rates
  * bucketed emerging/declining/stable).
  *
  * Scale shape: extraction is explode → single hash-aggregate on the
  * keyword key (map-side combined; the trigram generator is the
  * native codegen'd TokenShingles expression). The growth join is
  * keyword-key partitioned; per-bucket ranking windows partition on
  * the bucket key. Nothing is corpus-joined or collected.
  */
object Discover {

  case class DiscoverPanel(
      stopwords: Seq[String], bigramStopwords: Seq[String],
      priorityTerms: Seq[String])

  private def containsPriority(kw: Column, terms: Seq[String]): Column =
    terms.map(t => kw.contains(lit(t))).reduce(_ || _)

  /** Keyword OCCURRENCES per doc (dynamic_trends.py:127): unigrams
    * (≥3 chars, non-stopword), bigrams (≥6 chars, at least one
    * non-stopword side), trigrams only when they contain a priority
    * term. Counts are occurrence counts, like the reference's
    * Counter over append-per-hit.
    */
  def keywordOccurrences(
      docs: DataFrame, idCol: String, textCol: String,
      panel: DiscoverPanel): DataFrame = {
    val base = docs.select(col(idCol),
      TextFns.wsTokens(col(textCol)).as("t"))
    val stop = panel.stopwords
    val uni = base.select(col(idCol), explode(
      filter(col("t"), w => length(w) >= 3 && !w.isInCollection(stop)))
      .as("keyword"))
    val bi = base
      .select(col(idCol),
        explode(TextFns.shinglesOfTokens(col("t"), 2)).as("keyword"))
      .where(length(col("keyword")) >= 6 &&
        (!element_at(split(col("keyword"), " "), 1)
          .isInCollection(stop) ||
         !element_at(split(col("keyword"), " "), 2)
          .isInCollection(stop)))
    val tri = base
      .select(col(idCol),
        explode(TextFns.shinglesOfTokens(col("t"), 3)).as("keyword"))
      .where(containsPriority(col("keyword"), panel.priorityTerms))
    uni.unionAll(bi).unionAll(tri)
  }

  /** The discover endpoint (dynamic_trends.py:326): occurrence
    * counts filtered by the :161 meaningful-keyword rules, scored
    * count×(2 if priority), ranked by score, with the growth-signal
    * ladder (priority → rising, ≥10 occurrences → stable, else new)
    * and the max-3 sample-paper count.
    */
  def discover(
      docs: DataFrame, idCol: String, textCol: String,
      panel: DiscoverPanel, minCount: Long = 3,
      topN: Int = 20): DataFrame = {
    val g = keywordOccurrences(docs, idCol, textCol, panel)
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("frequency"),
        countDistinct(col(idCol)).as("nd"))
    val words = split(col("keyword"), " ")
    val isPriority = containsPriority(col("keyword"), panel.priorityTerms)
    val endsStop =
      element_at(words, 1).isInCollection(panel.stopwords) ||
        element_at(words, -1).isInCollection(panel.stopwords)
    g.where(col("frequency") >= minCount &&
        !col("keyword").rlike("^[0-9]+$") &&
        length(col("keyword")) >= 4 &&
        !col("keyword").isInCollection(panel.stopwords) &&
        !col("keyword").isInCollection(panel.bigramStopwords) &&
        (size(words) < 2 || !endsStop || isPriority))
      .select(col("keyword"), col("frequency"),
        least(lit(3L), col("nd")).as("paper_count"),
        when(isPriority, "rising")
          .when(col("frequency") >= 10, "stable")
          .otherwise("new").as("growth_signal"),
        (col("frequency") *
          when(isPriority, 2L).otherwise(1L)).as("score"))
      .orderBy(col("score").desc, col("keyword"))
      .limit(topN)
  }

  /** Two-period growth analysis (dynamic_trends.py:513): keywords of
    * either period (non-stopword, ≥4 chars, ≥2 hits in at least one
    * period), growth_rate = (recent−prev)/prev·100 with the prev=0 →
    * 100/0 branch, is_emerging = brand-new ∨ rate>50, bucketed
    * emerging (rate>30, ranked by rate desc) / declining (rate<−30,
    * rate asc) / stable (else, recent desc), limited per bucket.
    */
  def growthAnalysis(
      recent: DataFrame, previous: DataFrame, stopwords: Seq[String],
      limitPerBucket: Int = 15): DataFrame = {
    val j = recent.join(previous, Seq("keyword"), "full_outer")
      .select(col("keyword"),
        coalesce(col("recent_count"), lit(0L)).as("recent_count"),
        coalesce(col("previous_count"), lit(0L)).as("previous_count"))
      .where(!col("keyword").isInCollection(stopwords) &&
        length(col("keyword")) >= 4 &&
        (col("recent_count") >= 2 || col("previous_count") >= 2))
    val rate = when(col("previous_count") > 0,
        (col("recent_count") - col("previous_count")).cast("double")
          / col("previous_count") * 100.0)
      .otherwise(when(col("recent_count") > 0, 100.0).otherwise(0.0))
    val bucketed = j.withColumn("raw_rate", rate)
      .withColumn("bucket",
        when(col("raw_rate") > 30, "emerging")
          .when(col("raw_rate") < -30, "declining")
          .otherwise("stable"))
      .withColumn("is_emerging",
        (col("recent_count") > 0 && col("previous_count") === 0) ||
          col("raw_rate") > 50)
    val w = Window.partitionBy(col("bucket")).orderBy(
      when(col("bucket") === "emerging", -col("raw_rate"))
        .when(col("bucket") === "declining", col("raw_rate"))
        .otherwise(-col("recent_count").cast("double")),
      col("keyword"))
    bucketed
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= limitPerBucket)
      .select(col("bucket"), col("keyword"), col("recent_count"),
        col("previous_count"),
        round(col("raw_rate") + lit(1e-9), 1).as("growth_rate"),
        col("is_emerging"), col("rnk"))
  }
}
