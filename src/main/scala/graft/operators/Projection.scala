package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 2-D projection of embedding vectors for visualization — the
  * scalable public analog of the reference's t-SNE step
  * (reference: backend/app/core/vector_store.py:625-640 — t-SNE over
  * averaged paper embeddings, coordinates standardized to mean 0 /
  * std 1). t-SNE itself is inherently driver-local and
  * non-deterministic; the Spark-native scale path is PCA: the
  * covariance is a d²-bounded distributed aggregate (MLlib computes
  * it as a one-pass Gramian treeAggregate), and only the tiny d×d
  * eigendecomposition runs on the driver — legitimate because d=64
  * makes the covariance broadcast-sized at ANY corpus size.
  *
  * Oracle status is split by entry point: the base `pca2d` leaves
  * eigenvector signs implementation-defined (MLlib's SVD convention),
  * so its raw coordinates are spec-only — the spec asserts the
  * invariants (variance ordering, standardization, determinism).
  * `pca2dSignedTo` pins the sign by covariance convention and IS
  * oracle-checked at d=2 (`proj_pca2d`: DuckDB replays the
  * closed-form 2×2 eigenproblem and hash-matches the coordinates).
  */
object Projection {

  /** Project `vecCol` (array<float|double>) to standardized 2-D
    * coordinates (idCol, x, y).
    */
  def pca2d(vectors: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val fv = vectors.select(col(idCol),
      array_to_vector(VectorFnsCast.toDoubleArray(col(vecCol))).as("fv"))
    val model = new PCA().setK(2).setInputCol("fv").setOutputCol("pc").fit(fv)
    // cache: the projected frame feeds BOTH the standardization
    // aggregate and the output probe side (and, under pca2dSignedTo,
    // the orientation aggregate too) — uncached, each consumer
    // re-scans the caller's `vectors` lineage and re-runs the
    // transform, which at lake scale multiplies the dominant scan
    // cost 3-4×. (id, rx, ry) is three columns — the narrow shape
    // the graft.Caching caller-owned lifecycle exists for.
    val coords = model.transform(fv)
      .select(col(idCol), vector_to_array(col("pc")).as("c"))
      .select(col(idCol),
        element_at(col("c"), 1).as("rx"), element_at(col("c"), 2).as("ry"))
      .cache()
    // standardize like the reference: (coord - mean) / (std + 1e-8);
    // stats are a 1-row broadcast aggregate
    val stats = coords.agg(
      avg(col("rx")).as("mx"), stddev_pop(col("rx")).as("sx"),
      avg(col("ry")).as("my"), stddev_pop(col("ry")).as("sy"))
    coords.crossJoin(broadcast(stats))
      .select(col(idCol),
        ((col("rx") - col("mx")) / (col("sx") + 1e-8)).as("x"),
        ((col("ry") - col("my")) / (col("sy") + 1e-8)).as("y"))
  }

  /** [[pca2d]] with the eigenvector SIGN ambiguity pinned by
    * convention: output axis 1 (x) is oriented so its population
    * covariance with `refCols(0)` is non-negative, axis 2 (y) against
    * `refCols(1)` — the caller names two input columns whose
    * direction defines "positive". Eigenvectors of a symmetric
    * matrix are unique up to sign when eigenvalues are distinct, so
    * this removes the LAST implementation-defined degree of freedom
    * and makes the coordinates themselves deterministic — which is
    * what graduates the projection from spec-only invariants to an
    * oracle-checkable row (r15 verdict item 2): at d=2 the
    * eigenproblem has a closed form DuckDB can replay in plain SQL.
    *
    * Scale shape identical to pca2d plus one 1-row aggregate and one
    * broadcast: the orientation stats are two covariances over the
    * projected frame, never a second fit.
    *
    * `refCols` must be columns OF `vectors` (carried alongside the
    * vector column); a ref whose covariance with its axis is ~0 gives
    * an arbitrary (but still deterministic: ties orient positive)
    * sign — pick refs correlated with the expected principal
    * directions, e.g. the raw components themselves.
    */
  def pca2dSignedTo(
      vectors: DataFrame, idCol: String, vecCol: String,
      refCols: Seq[String]): DataFrame = {
    require(refCols.size == 2,
      s"pca2dSignedTo: need exactly 2 orientation columns, " +
        s"got ${refCols.size}")
    val coords = pca2d(vectors, idCol, vecCol)
    // joined feeds both the orientation aggregate and the output —
    // the same double-consumer shape as pca2d's coords. coords is
    // cached upstream, but the REFS side of this join scans the
    // caller's `vectors` lineage; caching the five narrow joined
    // columns keeps that to one scan per operator call (the
    // graft.Caching caller-owned lifecycle applies).
    val joined = coords.join(
      vectors.select(col(idCol),
        col(refCols.head).as("ref_x"), col(refCols(1)).as("ref_y")),
      Seq(idCol))
      .cache()
    val signs = joined.agg(
      covar_pop(col("x"), col("ref_x")).as("cx"),
      covar_pop(col("y"), col("ref_y")).as("cy"))
    joined.crossJoin(broadcast(signs))
      .select(col(idCol),
        (col("x") * when(col("cx") < 0, -1.0).otherwise(1.0)).as("x"),
        (col("y") * when(col("cy") < 0, -1.0).otherwise(1.0)).as("y"))
  }
}

/** Cast helper kept separate so Projection's MLlib imports stay
  * contained (array_to_vector requires array<double>).
  */
private[operators] object VectorFnsCast {
  def toDoubleArray(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(c, x => x.cast("double"))
}
