package graft

import org.apache.spark.sql.functions._

import graft.operators.Discover
import graft.operators.Discover.DiscoverPanel

/** Unit specs for dynamic keyword discovery and two-period growth —
  * the extraction rules and bucket boundaries.
  */
class DiscoverSpec extends SparkSpec {
  import spark.implicits._

  private val panel = DiscoverPanel(
    stopwords = Seq("the", "with"),
    bigramStopwords = Seq("in the"),
    priorityTerms = Seq("crispr", "gene editing"))

  test("keywordOccurrences: unigram/bigram/trigram rules") {
    val docs = Seq((1L, "the crispr tool with gene editing power"))
      .toDF("doc_id", "text")
    val out = Discover.keywordOccurrences(docs, "doc_id", "text", panel)
      .collect().map(_.getString(1)).toSeq
    // unigrams: stopwords 'the'/'with' dropped
    assert(out.count(_ == "crispr") >= 1 && !out.contains("the") &&
      !out.contains("with"))
    // bigram 'the crispr' kept (one side non-stop); 6-char min drops
    // nothing here; trigram only when it contains a priority term
    assert(out.contains("the crispr"))
    assert(out.contains("with gene editing")) // contains 'gene editing'
    assert(out.contains("crispr tool with"))  // contains 'crispr'
    assert(!out.contains("tool with gene"))   // no priority term
  }

  test("discover: priority boost, signal ladder, stopword-edge exception") {
    // 12 docs: 'crispr' 12× (priority, boost), 'tool' 12× (stable),
    // 'nine' 9× (new), 'the payload' bigram 9× — starts with a
    // stopword and carries no priority term → dropped
    val docs = ((1 to 12).map(i =>
      (i.toLong, "crispr tool" + (if (i <= 9) " nine the payload" else "")))
    ).toDF("doc_id", "text")
    val out = Discover.discover(docs, "doc_id", "text", panel,
        minCount = 3, topN = 10)
      .collect().map(r => r.getAs[String]("keyword") -> r).toMap
    assert(out("crispr").getAs[Long]("score") == 24L) // 12 × 2
    assert(out("crispr").getAs[String]("growth_signal") == "rising")
    assert(out("tool").getAs[Long]("score") == 12L)
    assert(out("tool").getAs[String]("growth_signal") == "stable")
    assert(out("nine").getAs[String]("growth_signal") == "new") // < 10
    assert(!out.contains("the payload"))
    // paper_count caps at 3
    assert(out("crispr").getAs[Long]("paper_count") == 3L)
  }

  test("discover: 4-char cut and pure digits dropped after counting") {
    val docs = (1 to 5).map(i => (i.toLong, "abc 12345 valid"))
      .toDF("doc_id", "text")
    val out = Discover.discover(docs, "doc_id", "text", panel,
        minCount = 3, topN = 10)
      .collect().map(_.getAs[String]("keyword")).toSet
    assert(out == Set("valid", "abc 12345", "12345 valid"))
  }

  test("growthAnalysis: bucket boundaries and is_emerging branches") {
    val recent = Seq(("brandnew", 5L), ("risen", 16L), ("grown", 13L),
      ("same", 10L), ("shrunk", 6L), ("gone", 0L), ("rare", 1L))
      .toDF("keyword", "recent_count")
    val prev = Seq(("risen", 10L), ("grown", 10L), ("same", 10L),
      ("shrunk", 10L), ("gone", 10L), ("rare", 1L))
      .toDF("keyword", "prev_count")
      .withColumnRenamed("prev_count", "previous_count")
    val out = Discover.growthAnalysis(recent, prev, Seq("stop"))
      .collect().map(r => r.getAs[String]("keyword") -> r).toMap
    // brandnew: prev 0 → rate 100, emerging bucket, is_emerging
    assert(out("brandnew").getAs[String]("bucket") == "emerging")
    assert(out("brandnew").getAs[Boolean]("is_emerging"))
    // risen +60% → emerging bucket AND is_emerging (rate > 50)
    assert(out("risen").getAs[String]("bucket") == "emerging")
    assert(out("risen").getAs[Boolean]("is_emerging"))
    // grown +30% → NOT > 30 → stable, not emerging
    assert(out("grown").getAs[String]("bucket") == "stable")
    assert(!out("grown").getAs[Boolean]("is_emerging"))
    assert(out("same").getAs[String]("bucket") == "stable")
    // shrunk −40% → declining
    assert(out("shrunk").getAs[String]("bucket") == "declining")
    assert(out("gone").getAs[Double]("growth_rate") == -100.0)
    // rare: both < 2 → filtered out
    assert(!out.contains("rare"))
  }

  test("growthAnalysis rank order per bucket") {
    val recent = Seq(("alpha", 30L), ("beta", 20L), ("hot2", 8L),
      ("hot1", 9L)).toDF("keyword", "recent_count")
    val prev = Seq(("alpha", 30L), ("beta", 20L), ("hot2", 2L),
      ("hot1", 3L)).toDF("keyword", "previous_count")
    val out = Discover.growthAnalysis(recent, prev, Nil)
      .collect()
      .map(r => (r.getAs[String]("bucket"), r.getAs[String]("keyword"),
        r.getAs[Long]("rnk")))
    // emerging ranked by rate desc: hot2 +300 before hot1 +200
    assert(out.filter(_._1 == "emerging").sortBy(_._3).map(_._2)
      .toSeq == Seq("hot2", "hot1"))
    // stable ranked by recent desc
    assert(out.filter(_._1 == "stable").sortBy(_._3).map(_._2)
      .toSeq == Seq("alpha", "beta"))
  }
}
