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
}
