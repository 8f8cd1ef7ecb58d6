package graft

import org.apache.spark.sql.functions._

import graft.operators.Trends

/** Unit specs for the daily-briefing hybrid trend tracks — ladder
  * boundaries and branch precedence the sf0.01 binding samples only
  * pointwise.
  */
class BriefTrendsSpec extends SparkSpec {
  import spark.implicits._

  test("predefinedTrends: label cuts at +50/+10/−10 and the week=0 branch") {
    val today = Seq(
      ("a", 150L), ("b", 110L), ("c", 100L), ("d", 95L), ("e", 89L),
      ("z", 10L)).toDF("name", "count")
    val week = Seq(
      ("a", 100L), ("b", 100L), ("c", 100L), ("d", 100L), ("e", 100L))
      .toDF("name", "week_count")
    val out = Trends.predefinedTrends(today, week, "name", topN = 6)
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(out("a").getAs[String]("change_label") == "surge") // +50
    assert(out("b").getAs[String]("change_label") == "up")    // +10
    assert(out("c").getAs[String]("change_label") == "steady") // 0
    assert(out("d").getAs[String]("change_label") == "steady") // −5
    assert(out("e").getAs[String]("change_label") == "down")  // −11
    // no history → the week=0 → +100% branch
    assert(out("z").getAs[String]("change_label") == "surge")
    assert(out("z").getAs[Double]("week_change") == 100.0)
    assert(out("z").getAs[Long]("week_ago_count") == 0L)
  }

  test("predefinedTrends: min-papers cut and top-N by count") {
    val today = Seq(("a", 4L), ("b", 20L), ("c", 30L), ("d", 10L))
      .toDF("name", "count")
    val week = Seq.empty[(String, Long)].toDF("name", "week_count")
    val out = Trends.predefinedTrends(today, week, "name", topN = 2)
      .collect()
    // a dropped (<5); top-2 of the rest by count desc
    assert(out.map(_.getAs[String]("name")).toSeq == Seq("c", "b"))
    assert(out.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L))
  }

  test("emergingTrends: is_new wins over rising; ≥2× cut is inclusive") {
    val today = Seq(
      ("fresh", 10L),   // prev 0 → new
      ("lowprev", 8L),  // prev 2 (<3) → new even though 4× growth
      ("doubled", 10L), // prev 5, exactly 2.0× → rising (inclusive)
      ("slowgrow", 9L), // prev 5, 1.8× → dropped
      ("small", 4L),    // < min papers → dropped
      ("panelword", 50L)) // predefined → skipped
      .toDF("keyword", "count")
    val prev = Seq(("lowprev", 2L), ("doubled", 5L), ("slowgrow", 5L))
      .toDF("keyword", "prev_count")
    val out = Trends.emergingTrends(today, prev, Seq("panel"), maxN = 10)
      .collect().map(r => r.getAs[String]("keyword") -> r).toMap
    assert(out.keySet == Set("fresh", "lowprev", "doubled"))
    assert(out("fresh").getAs[String]("change_label") == "new")
    assert(out("lowprev").getAs[String]("change_label") == "new")
    assert(out("doubled").getAs[String]("change_label") == "rising")
  }

  test("emergingTrends: predefined skip is bidirectional substring") {
    val today = Seq(("cart", 10L), ("car", 10L), ("carts", 10L),
      ("other", 10L)).toDF("keyword", "count")
    val prev = Seq.empty[(String, Long)].toDF("keyword", "prev_count")
    val out = Trends.emergingTrends(today, prev, Seq("cart"), maxN = 10)
      .collect().map(_.getAs[String]("keyword")).toSet
    // 'cart' equal, 'carts' contains it, 'car' is contained BY it —
    // all three skipped (hot_topics.py:191 checks both directions)
    assert(out == Set("other"))
  }

  test("brief_emerging plan: top-N is TakeOrdered, history broadcast") {
    val df = SparkEntry.queries("brief_emerging")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin"))
  }
}
