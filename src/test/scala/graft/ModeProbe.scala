package graft

import org.apache.spark.sql.functions._

/** r22 probe: pin down `mode(col, deterministic = true)` tie
  * semantics on this Spark build before labelPropagation's per-round
  * two-level aggregate is fused onto it. The LPA contract is
  * "plurality ties break to the SMALLEST label" — currently expressed
  * as max(struct(cnt, -label)). mode(col, true) is only a valid
  * fusion if its deterministic tie-break is exactly lowest-value.
  */
object ModeProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.localBuilder(4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // tie between labels 3 and 5 (2 votes each), 9 has 1 vote
    val df = Seq((1L, 5L), (1L, 5L), (1L, 3L), (1L, 3L), (1L, 9L),
      (2L, -7L), (2L, -7L), (2L, -2L), (2L, -2L), // negative-label tie
      (3L, 8L)).toDF("k", "v")
    val got = df.groupBy($"k").agg(mode($"v", deterministic = true).as("m"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"MODE-DET ${got.mkString(",")}")
    // expected if ties -> smallest value: (1,3),(2,-7),(3,8)
    // cross-check against the current LPA argmax on the same data
    val argmax = df.groupBy($"k", $"v").agg(count(lit(1)).as("cnt"))
      .groupBy($"k").agg(max(struct($"cnt", (-$"v").as("nl"))).as("m"))
      .select($"k", (-$"m.nl").as("label"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"LPA-ARGMAX ${argmax.mkString(",")}")
    println(s"MATCH ${got.sameElements(argmax)}")
    spark.stop()
  }
}
