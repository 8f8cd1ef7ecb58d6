package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Events, Fusion, Precision, Trends}

/** Unit specs for the scoring/trend/funnel operators that are
  * otherwise exercised only through their oracle queries — including
  * the edge cases the sf0.01 data never hits.
  */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("recencyScore reproduces the reference year-bucket ladder") {
    val out = (2015 to 2025).map(y => (y, y)).toDF("year", "y")
      .select(col("y"), Fusion.recencyScore(col("year"), 2025).as("r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(2025) == 100.0 && out(2024) == 100.0)
    assert(out(2023) == 80.0 && out(2022) == 80.0)
    assert(out(2021) == 60.0 && out(2020) == 60.0)
    assert(out(2019) == 40.0 && out(2018) == 40.0)
    assert(out(2017) == 20.0 && out(2015) == 20.0)
  }

  test("impactScore reproduces the citation buckets") {
    val out = Seq(-5L, 0L, 5L, 25L, 75L, 300L, 900L).map(c => Tuple1(c))
      .toDF("cit")
      .select(col("cit"), Fusion.impactScore(col("cit")).as("i"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(-5L) == 10.0 && out(0L) == 10.0 && out(5L) == 30.0)
    assert(out(25L) == 50.0 && out(75L) == 70.0)
    assert(out(300L) == 85.0 && out(900L) == 100.0)
  }

  test("keywordSimilarity: distinct-keyword match fraction, case-insensitive") {
    val docs = Seq(
      (1L, "Spark JOIN strategies for fast scans"), // spark, join, fast
      (2L, "a fast fast fast loop"),                // fast (counted once)
      (3L, "nothing relevant here"),                // none
      (4L, "spark filter join fast slow")           // all five
    ).toDF("id", "text")
    // duplicate + mixed-case keywords collapse to the distinct set
    val kws = Seq("Spark", "filter", "join", "fast", "slow", "SPARK")
    val out = docs.select(col("id"),
      Fusion.keywordSimilarity(col("text"), kws).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == 60.0) // 3 of 5
    assert(out(2L) == 20.0) // repeated hits count once
    assert(out(3L) == 0.0)
    assert(out(4L) == 100.0)
    intercept[IllegalArgumentException] {
      Fusion.keywordSimilarity(col("text"), Nil)
    }
  }

  test("precision search filters below min relevance and boosts title matches") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta filler filler"),
      // same terms but only in the tail (past the 20-char "title")
      (2L, "filler words leading alpha beta gamma delta epsilon"),
      (3L, "alpha only here with other words")
    ).toDF("doc_id", "text")
    val out = Precision.search(docs, "doc_id", "text",
      Seq("alpha", "beta", "gamma"), titleLen = 20, candidates = 10,
      minRelevance = 0.5, k = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getString(3), r.getDouble(5))).toMap
    assert(!out.contains(3L))               // 1/3 terms < 0.5 relevance
    assert(out(1L)._1 == "title")           // leading terms hit the title
    assert(out(2L)._1 == "full_text")
  }

  test("trend gaps: all patterns present yields an empty report") {
    val kws = Seq("alpha", "beta").toDF("token")
    val out = Trends.gaps(kws, "token",
      Seq("alpha" -> "a needed", "beta" -> "b needed"), 5)
    assert(out.count() == 0)
  }

  test("topicGrowth labels rising/declining/stable") {
    val docs = Seq(
      // topic a: 1 early, 5 late -> rising
      ("a", 2018), ("a", 2022), ("a", 2023), ("a", 2024), ("a", 2025), ("a", 2021),
      // topic b: 4 early, 1 late -> declining
      ("b", 2016), ("b", 2017), ("b", 2018), ("b", 2019), ("b", 2024),
      // topic c: 2 early, 2 late -> stable
      ("c", 2018), ("c", 2019), ("c", 2022), ("c", 2023)
    ).toDF("topic", "year")
    val out = Trends.topicGrowth(docs, "topic", "year", 2020)
      .collect().map(r => r.getString(0) -> r.getAs[String]("trend")).toMap
    assert(out("a") == "rising" && out("b") == "declining" && out("c") == "stable")
  }

  test("funnel: empty later stages count zero and never crash") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val events = Seq(
      (1L, new java.sql.Timestamp(base), "view", 1.0),
      (2L, new java.sql.Timestamp(base + 1000), "view", 1.0),
      (1L, new java.sql.Timestamp(base + 2000), "click", 1.0)
      // nobody purchases
    ).toDF("user_id", "tsx", "event_type", "value")
      // events tables carry ts as LONG nanos (see Tables.events)
      .withColumn("ts", (col("tsx").cast("double") * 1e9).cast("long"))
      .drop("tsx")
    val out = Events.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(out("view") == (2L, None))                 // first stage: no rate
    assert(out("click") == (1L, Some(0.5)))
    assert(out("purchase") == (0L, Some(0.0)))
  }

  test("funnel: a zero-user middle stage yields NULL rate, not DIVIDE_BY_ZERO") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val events = Seq(
      (1L, new java.sql.Timestamp(base), "view", 1.0),
      (2L, new java.sql.Timestamp(base + 1000), "view", 1.0)
      // nobody clicks OR purchases: click=0 then purchase computes 0/0
    ).toDF("user_id", "tsx", "event_type", "value")
      .withColumn("ts", (col("tsx").cast("double") * 1e9).cast("long"))
      .drop("tsx")
    val out = Events.funnel(events, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) ->
        (r.getLong(2), Option(r.get(3)))).toMap
    assert(out("view") == (2L, None))
    assert(out("click") == (0L, Some(0.0)))
    assert(out("purchase")._1 == 0L && out("purchase")._2.isEmpty) // 0/0 -> NULL
  }

  test("expanded bm25: an expansion duplicating a primary term keeps full weight") {
    val docs = Seq(
      (1L, "spark spark filter data"), (2L, "spark data table row")
    ).toDF("doc_id", "text")
    val plain = Bm25.topK(docs, "doc_id", "text", Seq("spark", "filter"), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // "filter" appears as both primary and expansion — must not build
    // ambiguous tf columns, and primary weight wins
    val dup = Bm25.topKExpanded(docs, "doc_id", "text",
      Seq("spark", "filter"), Seq("filter"), 0.5, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dup == plain)
  }

  test("expanded bm25: absent expansion terms contribute nothing") {
    val docs = Seq(
      (1L, "spark spark filter data"), (2L, "spark data table row")
    ).toDF("doc_id", "text")
    val plain = Bm25.topK(docs, "doc_id", "text", Seq("spark", "filter"), 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expanded = Bm25.topKExpanded(docs, "doc_id", "text",
      Seq("spark", "filter"), Seq("nonexistentterm"), 0.5, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain == expanded)
  }

  test("minMaxFuse normalizes to 0-100 and fuses at the given weights") {
    val cand = Seq(
      (1L, 50.0, 0.2), (2L, 10.0, 0.6), (3L, 30.0, 0.4)
    ).toDF("doc_id", "orig", "cross")
    val out = Fusion.minMaxFuse(cand, "orig", "cross", 0.3, 0.7)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("rerank_score"), r.getAs[Double]("final_score")))
      .toMap
    assert(out(1L)._1 == 0.0)     // min -> 0
    assert(out(2L)._1 == 100.0)   // max -> 100
    assert(out(3L)._1 == 50.0)    // midpoint
    assert(out(1L)._2 == 15.0)    // 0.3*50 + 0.7*0
    assert(out(2L)._2 == 73.0)    // 0.3*10 + 0.7*100
  }

  test("minMaxFuse with all-equal scores uses range 1, like the reference") {
    val cand = Seq((1L, 40.0, 0.5), (2L, 20.0, 0.5)).toDF("doc_id", "orig", "cross")
    val out = Fusion.minMaxFuse(cand, "orig", "cross", 0.3, 0.7)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("rerank_score"), r.getAs[Double]("final_score")))
      .toMap
    // (s - min)/1 * 100 = 0 for every row -> final is pure original
    assert(out(1L) == (0.0, 12.0))
    assert(out(2L) == (0.0, 6.0))
  }
}
