package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off r14 probe: the persisted-index `annIvfProbe` path at the
  * probe directory's NATIVE vector dimension — run against
  * `.scaleprobe/sf1` (d=64) and `.scaleprobe/sf1d768` (the reference
  * embedder's d=768, WidenVecs output) to pin how the two-phase
  * probe's constants scale with d: the codebook broadcast, the
  * nprobe ranking job (|codebook| rows × d), and the probed-cells
  * scoring fold (×d per row) — while the partition-pruned LISTING is
  * dimension-independent. Mirrors the vs_ann_ivf_srp coarse
  * quantizer (SRP sign codes over the leading 4 dims → 16 cells,
  * per-cell mean centroids). Not part of the API.
  */
object VecWidthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/.scaleprobe/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFns
    import graft.operators.VectorSearch

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("cell", VectorFns.signCode(col("embedding"), 4).cast("int"))
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val centroids = VectorSearch.centroidArrays(emb, "cell", "embedding")
    val assigned = VectorSearch.assignCells(
      emb.select(col("vec_id"), col("embedding")), centroids,
      "vec_id", "embedding", "cell")

    val tmp = java.nio.file.Files.createTempDirectory("vecwidth_ivf")
    val (idxDir, cDir) = (s"$tmp/index", s"$tmp/codebook")
    val t0 = System.nanoTime()
    graft.sources.Corpus.writePartitioned(assigned, idxDir, Seq("cell"))
    centroids.write.parquet(cDir)
    val ingestSecs = (System.nanoTime() - t0) / 1e9
    val idxRows = spark.read.parquet(idxDir).count()
    println(f"VECWIDTH dim=$dim index_rows=$idxRows ingest=$ingestSecs%.3f")

    val q = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("vec_id") === 0).select(col("embedding").as("qe"))
    (1 to 3).foreach { i =>
      val t1 = System.nanoTime()
      val n = VectorSearch.annIvfProbe(
        spark.read.parquet(idxDir), q, spark.read.parquet(cDir),
        "vec_id", "embedding", "qe", "cell", nprobe = 3, k = 10)
        .collect().length
      val probeSecs = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      System.gc()
      println(f"VECWIDTH dim=$dim probe_iter$i rows=$n probe=$probeSecs%.3f")
    }
    spark.stop()
  }
}
