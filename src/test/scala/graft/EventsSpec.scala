package graft

import graft.operators.{Events, Trends}

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ns(secs: Long): Long = secs * 1000000000L

  test("sessionize splits on gaps larger than the threshold") {
    val ev = Seq(
      (1L, 7L, ns(0), 1.0), (2L, 7L, ns(100), 2.0), // session 1
      (3L, 7L, ns(2000), 3.0), // gap 1900s > 1800 -> session 2
      (4L, 8L, ns(50), 4.0) // other user
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Events.sessionize(ev, 1800)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("duration_secs"))).toMap
    assert(out((7L, 1L)) == (2L, 100L))
    assert(out((7L, 2L)) == (1L, 0L))
    assert(out((8L, 1L)) == (1L, 0L))
  }

  test("growth labels rising and declining types") {
    // type A: 1 early, 4 late (rising); type B: 4 early, 1 late (declining)
    val rows = Seq(
      ("A", ns(0)), ("A", ns(900)), ("A", ns(910)), ("A", ns(920)), ("A", ns(930)),
      ("B", ns(1)), ("B", ns(2)), ("B", ns(3)), ("B", ns(4)), ("B", ns(1000))
    ).zipWithIndex.map { case ((t, ts), i) => (i.toLong, 1L, ts, t, 1.0) }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Trends.growth(ev)
      .collect().map(r => r.getString(0) -> r.getAs[String]("trend")).toMap
    assert(out("A") == "rising")
    assert(out("B") == "declining")
  }
}
