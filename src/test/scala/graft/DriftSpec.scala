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

  test("minP out of range is rejected") {
    val f = Seq(("s", 0L)).toDF("stratum", "bucket")
    intercept[IllegalArgumentException] {
      Drift.psi(f, f, "stratum", "bucket", minP = 0.0)
    }
  }
}
