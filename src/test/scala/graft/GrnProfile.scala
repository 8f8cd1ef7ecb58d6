package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev harness: stage-by-stage timing of the sc_grn pipeline to
  * locate where wall-clock goes at sf0.1 (companion to BenchOne).
  */
object GrnProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.localBuilder(32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    s.range(1000000L).selectExpr("sum(id)").collect()
    s.read.parquet(s"$d/lineitem.parquet").count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
    }

    val gid = pmod(col("l_partkey"), lit(20))
    def sparsity = Tables.lineitem(s, d).select(
      pmod(col("l_orderkey"), lit(2000)).cast("long").as("cell_id"),
      gid.cast("long").as("gid")).distinct()
    time("sparsity.distinct")(sparsity.count())
    val names = Seq("T_cells", "NK_cells", "B_cells", "Macrophages",
      "Fibroblasts", "Endothelial", "Epithelial", "Treg")
    val name = names.zipWithIndex.foldRight(lit("")) { case ((n, i), rest) =>
      when(pmod(col("cell_id"), lit(names.size)) === i, lit(n)).otherwise(rest)
    }
    def ex = sparsity.select(name.as("ct"), col("cell_id"),
      concat(when(col("gid") < 5, lit("MT-")).otherwise(lit("G")),
        col("gid").cast("string")).as("gene"),
      (pmod(col("cell_id") * (lit(1) + pmod(col("gid"), lit(5))), lit(101))
        + lit(1.0)).cast("double").as("x"))
    time("ex")(ex.count())
    def nType = ex.select($"ct", $"cell_id").distinct()
      .groupBy($"ct").agg(count(lit(1)).cast("double").as("n_cells"))
      .where($"n_cells" >= 20.0)
    time("nType")(nType.count())
    val tfs = (10 to 14).map(i => s"G$i")
    def roles = ex.select($"gene").distinct()
      .withColumn("is_tf", $"gene".isin(tfs: _*))
      .withColumn("tgt_rank", row_number().over(
        Window.partitionBy($"is_tf").orderBy($"gene")))
      .withColumn("is_target", !$"is_tf" && $"tgt_rank" <= 100)
      .where($"is_tf" || $"is_target")
      .select($"gene", $"is_tf", $"is_target")
    time("roles")(roles.count())
    def sub = ex.select($"ct", $"cell_id", $"gene", round($"x" + lit(1e-9), 6).as("xr"))
      .join(broadcast(nType), Seq("ct"))
      .join(broadcast(roles), Seq("gene"))
    time("sub")(sub.count())
    val byGene = Window.partitionBy($"ct", $"gene")
    def ranked = sub
      .withColumn("rank_min", rank().over(byGene.orderBy($"xr")).cast("double"))
      .withColumn("cnt_eq", count(lit(1)).over(
        Window.partitionBy($"ct", $"gene", $"xr")).cast("double"))
      .withColumn("n_present", count(lit(1)).over(byGene).cast("double"))
      .withColumn("n_zero", $"n_cells" - $"n_present")
      .withColumn("r_abs", $"n_zero" + $"rank_min" + ($"cnt_eq" - 1.0) / 2.0)
      .withColumn("z0", ($"n_zero" + 1.0) / 2.0)
    time("ranked")(ranked.count())
    val r = ranked.cache()
    time("ranked.cache-fill")(r.count())
    def tfSide = r.where($"is_tf").select($"ct", $"cell_id", $"gene".as("tf"), $"r_abs".as("rta"))
    def tgSide = r.where($"is_target").select($"ct", $"cell_id", $"gene".as("target"), $"r_abs".as("rtb"))
    def co = tfSide.hint("merge").join(tgSide, Seq("ct", "cell_id"))
      .groupBy($"ct", $"tf", $"target")
      .agg(count(lit(1)).cast("double").as("n_ab"),
        sum($"rta").as("sa_ab"), sum($"rtb").as("sb_ab"),
        sum($"rta" * $"rtb").as("sab"))
    time("co (pair join+agg)")(co.count())
    time("full sc_grn")(SparkEntry.queries("sc_grn")(s, d).count())
    time("full sc_grn again")(SparkEntry.queries("sc_grn")(s, d).count())
    s.stop()
  }
}
