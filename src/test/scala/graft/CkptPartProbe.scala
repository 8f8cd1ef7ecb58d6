package graft

import org.apache.spark.sql.functions._

/** Dev probe (r21): does a localCheckpoint preserve outputPartitioning
  * so that a later join on the same key skips the Exchange on the
  * checkpointed side?
  */
object CkptPartProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.localBuilder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (aqe <- Seq(true, false)) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      val edges = spark.range(10000).select(
        (col("id") % 97).as("src"), (col("id") % 131).as("dst"))
        .repartition(col("dst"))
        .localCheckpoint()
      val labels = spark.range(131).select(col("id").as("dst"), col("id").as("label"))
      val j = edges.join(labels.hint("merge"), Seq("dst"))
        .groupBy(col("src")).agg(max(col("label")))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      val exch = plan.linesIterator.count(_.contains("Exchange hashpartitioning(dst"))
      println(s"AQE=$aqe dst-exchanges=$exch")
      println(plan.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("ExistingRDD")).mkString("\n"))
    }
    spark.stop()
  }
}
