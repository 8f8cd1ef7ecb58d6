package graft

import org.apache.spark.sql.functions._

/** Test-scope scale probe for the PQ/IVF-PQ pipeline beyond the
  * 500-vector testdata: deterministic synthetic corpus (crc-derived,
  * reproducible), separating train / encode / query cost. Usage:
  *   sbt "Test/runMain graft.PqProfile [nVectors [dim]]"
  */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val dim = if (args.length > 1) args(1).toInt else 64
    val spark = Sessions.localBuilder(32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    // deterministic pseudo-random vectors with mild cluster structure
    // (8 archetypes + noise) so IVF cells are non-degenerate
    val vecs = spark.range(n.toLong)
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          ((pmod(crc32(concat_ws("_", col("id") % 8, i)), lit(1000L))
            .cast("double") / 1000.0) * 0.7 +
            (pmod(crc32(concat_ws("x", col("id"), i)), lit(1000L))
              .cast("double") / 1000.0) * 0.3)
          .cast("float")).as("embedding"))
      .localCheckpoint()
    println(s"[pq] $n vectors, dim $dim")
    val (coarse, books, codes0) = timed("ivfPqBuild (train)") {
      val t = graft.operators.Pq.ivfPqBuild(
        vecs, "vec_id", "embedding", dim, nCells = 16, m = 8, k = 64,
        iters = 2)
      t._1.count(); t._2.count(); (t._1, t._2, t._3)
    }
    val codes = timed("encode materialization") {
      val c = codes0.localCheckpoint(); c.count(); c
    }
    val query = vecs.where(col("vec_id") === 7L)
      .select(col("embedding").as("qe"))
    val top = timed("ivfPqTopK nprobe=4 (of 16 cells)") {
      graft.operators.Pq.ivfPqTopK(codes, coarse, books, query,
        "vec_id", "qe", dim, 8, 4, 10).collect()
    }
    println(s"[pq] top ids: ${top.take(5).map(_.getLong(0)).mkString(", ")}")
    val exact = timed("exact denseTopK (the uncompressed baseline)") {
      graft.operators.VectorSearch.denseTopK(vecs, query,
        "vec_id", "embedding", "qe", 10).collect()
    }
    val exactSet = exact.map(_.getLong(0)).toSet
    val recall = (top.map(_.getLong(0)).toSet & exactSet).size / 10.0
    // all-cells probe isolates the PQ quantization loss from the
    // IVF probe loss — on near-tie corpora (clustered archetypes:
    // top-10 cosine margins ~1e-3) reconstruction error re-ranks
    // easily, which is the honest adversarial read, same as
    // AnnRecallSpec's near-uniform caveat
    val allCells = graft.operators.Pq.ivfPqTopK(codes, coarse, books,
      query, "vec_id", "qe", dim, 8, 16, 10).collect()
      .map(_.getLong(0)).toSet
    val recallAll = (allCells & exactSet).size / 10.0
    println(f"[pq] recall@10 vs exact: nprobe=4 -> $recall%.2f; " +
      f"all cells -> $recallAll%.2f (gap below 1.0 = PQ loss on " +
      "near-tie margins, gap between the two = IVF probe loss)")
    spark.stop()
  }
}
