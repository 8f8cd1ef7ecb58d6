package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for scan pruning — the Z-order
  * (Morton-curve) clustering a lakehouse runs as OPTIMIZE ZORDER BY
  * (reference analog: the store's single-key chroma collections have
  * no layout story at all; this is the 100 TB substitute for the
  * secondary indexes it relies on).
  *
  * Why: parquet skipping is driven by per-file/row-group min-max
  * stats. A sort by column A gives perfect pruning on A and NONE on
  * B — every file spans B's whole range. Interleaving the bits of
  * equal-frequency bin ranks of A and B gives every file a small
  * HYPER-RECTANGLE of (A, B) space, so predicates on EITHER column
  * skip most files (≈ n^(1-1/d) of files touched for a point filter
  * in d dimensions, vs all of them for the unsorted column).
  *
  * Scale shape: the only driver-side state is the quantile cut
  * points (d · (2^bits − 1) doubles from approxQuantile — a bounded
  * sketch pass); binning + bit interleave are narrow codegen'd
  * expressions behind the scan; the clustering itself is ONE
  * repartitionByRange + in-partition sort on the z-key — the same
  * exchange budget as the plain sort a shard writer already pays.
  */
object Layout {

  /** Equal-frequency bin index in [0, 2^bits) for a numeric column,
    * binned against the given ascending cut points (callers get them
    * from `approxQuantile` — see `writeZordered`). Each comparison is
    * a codegen'd conditional; nulls fall into bin 0 (CASE WHEN null
    * yields the otherwise-branch), keeping them clustered instead of
    * poisoning the key.
    */
  def binByCuts(c: Column, cuts: Array[Double]): Column = {
    // each cut is one chained conditional in the generated code;
    // cap at 8 bits (255 cuts) so a caller can't codegen-bomb the
    // projection — beyond that the bins stop paying for themselves
    require(cuts.length <= 255,
      s"binByCuts: ${cuts.length} cuts exceeds the 8-bit (255) cap")
    cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(c >= cut, 1).otherwise(0)
    }
  }

  /** Morton interleave of per-column bin indexes (each in
    * [0, 2^bits)): bit i of bin j lands at position i·d + j. With
    * bits·d ≤ 63 the key fits a long.
    */
  def zorderKey(bins: Seq[Column], bits: Int): Column = {
    require(bins.nonEmpty, "zorderKey: at least one bin column")
    require(bits * bins.length <= 63,
      s"zorderKey: $bits bits x ${bins.length} dims exceeds a long")
    val d = bins.length
    (0 until bits).flatMap { i =>
      bins.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
          i * d + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order-clustered parquet write over numeric `zCols`: one
    * approxQuantile sketch pass for the cut points, then bin →
    * interleave → repartitionByRange(numFiles) + in-partition sort on
    * the z-key, so every output file covers a contiguous z-range — a
    * small hyper-rectangle of the clustered columns' space whose
    * min-max stats let a scan on ANY of them skip most files.
    * Returns the per-column cut points (the layout's metadata — a
    * maintenance job logs them; re-clustering with the same cuts
    * keeps layouts comparable across snapshots).
    */
  def writeZordered(
      df: DataFrame, path: String, zCols: Seq[String],
      bits: Int, numFiles: Int): Map[String, Array[Double]] = {
    require(numFiles > 0, s"writeZordered: numFiles must be positive")
    require(bits >= 1 && bits <= 8,
      s"writeZordered: bits must be in [1, 8], got $bits")
    val k = 1 << bits
    val probes = (1 until k).map(_.toDouble / k).toArray
    val cuts = zCols.map { c =>
      c -> df.stat.approxQuantile(c, probes, 0.001)
    }.toMap
    val keyed = df.withColumn("_z",
      zorderKey(zCols.map(c => binByCuts(col(c), cuts(c))), bits))
    keyed
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
    cuts
  }
}
