package graft

import org.apache.spark.sql.functions._

import graft.operators.Projection

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  // points spread mainly along one latent direction (1, 2, 0.5) with a
  // small orthogonal wiggle — PCA must put the spread on the x axis
  private def vecs = (0 until 40).map { i =>
    val t = (i - 20).toDouble
    val w = if (i % 2 == 0) 0.3 else -0.3
    (i.toLong, Array(t * 1.0 + w, t * 2.0 - w, t * 0.5 + 2 * w))
  }.toDF("vec_id", "embedding")

  test("pca2d emits standardized 2-D coordinates") {
    val out = Projection.pca2d(vecs, "vec_id", "embedding")
    val rows = out.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 40)
    val xs = rows.map(_._2)
    val ys = rows.map(_._3)
    def meanOf(a: Seq[Double]) = a.sum / a.length
    def varOf(a: Seq[Double]) = { val m = meanOf(a); a.map(v => (v - m) * (v - m)).sum / a.length }
    // standardized: mean ~ 0, std ~ 1 on both axes
    assert(math.abs(meanOf(xs)) < 1e-6 && math.abs(meanOf(ys)) < 1e-6)
    assert(math.abs(varOf(xs) - 1.0) < 1e-3 && math.abs(varOf(ys) - 1.0) < 1e-3)
  }

  test("first component captures the dominant direction (pre-standardization)") {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    val fv = vecs.select(array_to_vector(
      transform(col("embedding"), x => x.cast("double"))).as("fv"))
    val model = new PCA().setK(2).setInputCol("fv").setOutputCol("pc").fit(fv)
    val ev = model.explainedVariance.toArray
    assert(ev(0) > 0.9)      // the latent line dominates
    assert(ev(0) > ev(1))    // components ordered by variance
  }

  test("pca2d is deterministic across runs") {
    val a = Projection.pca2d(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val b = Projection.pca2d(vecs, "vec_id", "embedding")
      .orderBy("vec_id").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(a.sameElements(b))
  }

  test("pca2dSignedTo pins the eigenvector sign by the ref columns") {
    // 2-D input with a clear gap: p spread ~10x q's. x must track p
    // (dominant axis), y must track q — POSITIVELY for both, because
    // the orientation covariances are pinned non-negative. And the
    // pin makes the output EQUIVARIANT under data negation: coords of
    // -X are exactly -(coords of X), because the refs flip with the
    // data — whereas unpinned PCA would leave the relation to the
    // solver's arbitrary eigenvector sign.
    val base = (0 until 50).map { i =>
      val t = (i - 25).toDouble
      val w = math.sin(i.toDouble) // decorrelated wiggle
      (i.toLong, t + 0.1 * w, 0.1 * t - 0.3 * w)
    }.toDF("vec_id", "p", "q")
      .withColumn("v", array(col("p"), col("q")))
    val out = Projection.pca2dSignedTo(base, "vec_id", "v", Seq("p", "q"))
      .join(base.select(col("vec_id"), col("p"), col("q")), Seq("vec_id"))
    val Array(cx, cy) = out
      .agg(covar_pop(col("x"), col("p")), covar_pop(col("y"), col("q")))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(cx > 0.0 && cy > 0.0)

    val neg = base.select(col("vec_id"), (-col("p")).as("p"),
      (-col("q")).as("q"))
      .withColumn("v", array(col("p"), col("q")))
    val a = Projection.pca2dSignedTo(base, "vec_id", "v", Seq("p", "q"))
      .orderBy("vec_id").collect()
      .map(r => (math.rint(r.getDouble(1) * 1e9),
        math.rint(r.getDouble(2) * 1e9)))
    val b = Projection.pca2dSignedTo(neg, "vec_id", "v", Seq("p", "q"))
      .orderBy("vec_id").collect()
      .map(r => (math.rint(-r.getDouble(1) * 1e9),
        math.rint(-r.getDouble(2) * 1e9)))
    assert(a.sameElements(b))

    intercept[IllegalArgumentException] {
      Projection.pca2dSignedTo(base, "vec_id", "v", Seq("p"))
    }
  }
}
