package graft

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi matches the hand-computed statistic and ladder per stratum") {
    // stratum a: base 40/60 vs current 60/40 across two buckets
    //   psi = 0.2·ln(1.5) + 0.2·ln(1.5) = 0.162186 → moderate
    // stratum b: identical distributions → psi 0 → stable
    // stratum c: disjoint buckets → both sides floor at minP:
    //   psi = 2·(1 − 1e-6)·ln(1/1e-6) ≈ 27.630993 → high
    def rows(st: String, bucket: Long, n: Int) =
      Seq.fill(n)((st, bucket))
    val base = (rows("a", 0L, 4) ++ rows("a", 1L, 6) ++
      rows("b", 0L, 5) ++ rows("b", 1L, 5) ++
      rows("c", 0L, 5)).toDF("stratum", "bucket")
    val cur = (rows("a", 0L, 6) ++ rows("a", 1L, 4) ++
      rows("b", 0L, 5) ++ rows("b", 1L, 5) ++
      rows("c", 1L, 5)).toDF("stratum", "bucket")
    val out = Drift.psi(base, cur, "stratum", "bucket")
      .collect()
      .map(r => r.getAs[String]("stratum") ->
        ((r.getAs[Long]("n_base"), r.getAs[Long]("n_current"),
          r.getAs[Double]("psi"), r.getAs[String]("drift_level"))))
      .toMap
    assert(out("a")._1 == 10L && out("a")._2 == 10L)
    assert(math.abs(out("a")._3 - 0.162186) < 1e-6, s"a: ${out("a")._3}")
    assert(out("a")._4 == "moderate")
    assert(out("b")._3 == 0.0 && out("b")._4 == "stable")
    assert(math.abs(out("c")._3 - 27.630993) < 1e-5, s"c: ${out("c")._3}")
    assert(out("c")._4 == "high")
    assert(out.size == 3)
  }

  test("psi is symmetric-positive: swapping snapshots keeps the value") {
    val x = (Seq.fill(8)(("s", 0L)) ++ Seq.fill(2)(("s", 1L)))
      .toDF("stratum", "bucket")
    val y = (Seq.fill(3)(("s", 0L)) ++ Seq.fill(7)(("s", 1L)))
      .toDF("stratum", "bucket")
    def psiOf(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      Drift.psi(a, b, "stratum", "bucket")
        .collect().head.getAs[Double]("psi")
    val fwd = psiOf(x, y)
    assert(fwd > 0.0)
    assert(fwd == psiOf(y, x)) // PSI is symmetric in its two snapshots
  }

  test("psiFromCounts consolidates duplicate (stratum, bucket) rows") {
    import org.apache.spark.sql.functions._
    // the same distribution twice: once as unique (stratum, bucket)
    // counts, once split across duplicate key rows (two closed
    // streaming windows landing in one micro-batch). Without internal
    // consolidation the full_outer join fans out and the per-stratum
    // totals double-count.
    val base = Seq(("s", 0L, 4L), ("s", 1L, 6L))
      .toDF("stratum", "bucket", "cnt")
    val curUnique = Seq(("s", 0L, 6L), ("s", 1L, 4L))
      .toDF("stratum", "bucket", "cnt")
    val curSplit = Seq(("s", 0L, 2L), ("s", 0L, 4L), ("s", 1L, 1L),
      ("s", 1L, 3L)).toDF("stratum", "bucket", "cnt")
    def run(cur: org.apache.spark.sql.DataFrame) =
      Drift.psiFromCounts(base, cur, "stratum", "bucket", "cnt")
        .collect().head
    val u = run(curUnique)
    val d = run(curSplit)
    assert(math.abs(u.getAs[Double]("psi") - 0.162186) < 1e-6)
    assert(d.getAs[Double]("psi") == u.getAs[Double]("psi"))
    assert(d.getAs[Long]("n_current") == 10L) // not double-counted
    // duplicate BASE rows consolidate too
    val baseSplit = Seq(("s", 0L, 1L), ("s", 0L, 3L), ("s", 1L, 6L))
      .toDF("stratum", "bucket", "cnt")
    val b = Drift.psiFromCounts(baseSplit, curUnique,
      "stratum", "bucket", "cnt").collect().head
    assert(b.getAs[Double]("psi") == u.getAs[Double]("psi"))
    assert(b.getAs[Long]("n_base") == 10L)
  }

  test("minP out of range is rejected") {
    val f = Seq(("s", 0L)).toDF("stratum", "bucket")
    intercept[IllegalArgumentException] {
      Drift.psi(f, f, "stratum", "bucket", minP = 0.0)
    }
  }
}
