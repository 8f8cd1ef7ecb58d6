package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.operators.VectorSearch

/** Measured recall-vs-nprobe CURVES for the IVF ANN surface against
  * exact brute force — the nprobe recall/cost trade as numbers rather
  * than an article of faith (SURVEY §5: probing nprobe of K cells
  * scores ~nprobe/K of the corpus; this spec supplies the recall half
  * of that trade, the analog of the reference's serving-path tuning
  * at vector_store.py:272).
  *
  * Everything here is DETERMINISTIC (fixed corpus, fixed codebooks,
  * rounded cosines with id tiebreaks), so the measured points are
  * exact, the floors are measurement-minus-a-small-margin (not
  * arbitrary), and two structural properties are asserted besides the
  * operating-point floors:
  *  - recall is monotonically non-decreasing in nprobe (probing more
  *    cells only ever grows the candidate set, and a true-top-k item
  *    can only be displaced by another true-top-k item);
  *  - probing ALL cells reproduces the exact top-k EXACTLY (the
  *    candidate set is the corpus, and both paths rank on the same
  *    rounded cosine with the same id tiebreak).
  *
  * Measured curves at sf0.01 (near-uniform synthetic vectors — the
  * WORST case for IVF; clustered real corpora concentrate the true
  * top-k in few cells):
  *   vs_ann_ivf   (10 label cells, recall@10 by nprobe 1..10):
  *     0.30 0.40 0.50 0.70 0.80 0.90 0.90 0.90 1.00 1.00
  *   vs_ann_ivf_srp (16 SRP cells, recall@10 by nprobe 1..16):
  *     0.30 0.30 0.40 0.50 0.50 0.70 0.70 0.70 0.90 0.90 1.00 ... 1.00
  * The oracle bindings' operating point nprobe=3 trades ~70% of the
  * scan for ~half the exact recall on this adversarial corpus.
  */
class AnnRecallSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.01"

  private def recall(ann: Set[Long], exact: Set[Long]): Double =
    ann.intersect(exact).size.toDouble / exact.size

  /** recall@10 for each nprobe in 1..K for the given cell column /
    * codebook, against the exact brute-force top-10.
    */
  private def curve(groupCol: String, k: Int): Seq[Double] = {
    val emb0 = Tables.embeddings(spark, d)
    val emb =
      if (groupCol == "label") emb0
      else emb0.withColumn(groupCol,
        VectorFns.signCode(col("embedding"), 4).cast("int"))
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val exact = VectorSearch
      .denseTopK(emb, q, "vec_id", "embedding", "qe", 10)
      .collect().map(_.getLong(0)).toSet
    val centroids = VectorSearch.centroidArrays(emb, groupCol, "embedding")
    (1 to k).map { nprobe =>
      val ann = VectorSearch
        .annIvf(emb.select(col("vec_id"), col("embedding")), q, centroids,
          "vec_id", "embedding", "qe", groupCol, nprobe = nprobe, k = 10)
        .collect().map(_.getLong(0)).toSet
      recall(ann, exact)
    }
  }

  private def assertCurveShape(name: String, rs: Seq[Double]): Unit = {
    info(s"$name recall@10 by nprobe: " +
      rs.map(r => f"$r%.2f").mkString(", "))
    rs.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
      assert(b >= a,
        f"$name recall must not decrease with nprobe: " +
          f"nprobe=${i + 1} -> $a%.2f, nprobe=${i + 2} -> $b%.2f")
    }
    assert(rs.last == 1.0,
      f"$name probing all cells must reproduce the exact top-k, " +
        f"got recall ${rs.last}%.2f")
  }

  test("vs_ann_ivf (10 label cells): recall@10 curve over nprobe=1..10") {
    val rs = curve("label", 10)
    assertCurveShape("vs_ann_ivf", rs)
    // operating point (the vs_ann_ivf oracle binding): nprobe=3.
    // Measured 0.50 on this corpus; floor = measured - 0.05 margin
    // for benign ulp drift in centroid means
    assert(rs(2) >= 0.45, f"recall@10 at nprobe=3 regressed: ${rs(2)}%.2f")
  }

  test("vs_ann_ivf_srp (16 SRP cells): recall@10 curve over nprobe=1..16") {
    val rs = curve("cell", 16)
    assertCurveShape("vs_ann_ivf_srp", rs)
    // operating point (the vs_ann_ivf_srp oracle binding): nprobe=3
    // of 16 cells — a ~19% scan fraction. Measured 0.40; floor with
    // the same 0.05 margin
    assert(rs(2) >= 0.35, f"recall@10 at nprobe=3 regressed: ${rs(2)}%.2f")
  }

  test("vs_ann_ivf_batch (nprobe=3, k=5): mean recall@5 over the query batch") {
    val emb = Tables.embeddings(spark, d)
    val cs = emb.where(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("label"))
    val qs = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val exact = VectorSearch
      .knnJoin(cs, qs, "cid", "ce", "qid", "qe", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val centroids = VectorSearch.centroidArrays(cs, "label", "ce")
    val ann = VectorSearch
      .annIvfBatch(cs, qs, centroids, "cid", "ce", "qid", "qe", "label",
        nprobe = 3, k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, ex) =>
      recall(ann.getOrElse(qid, Set.empty), ex)
    }
    val mean = recalls.sum / recalls.size
    info(f"vs_ann_ivf_batch mean recall@5 = $mean%.2f over ${recalls.size} queries")
    assert(recalls.size == 10)
    // measured 0.44 mean over the 10-query batch; floor = measured -
    // 0.05 (per-query recall is deterministic; the margin covers ulp
    // drift only)
    assert(mean >= 0.39, f"mean recall@5 regressed: $mean%.2f")
  }
}
