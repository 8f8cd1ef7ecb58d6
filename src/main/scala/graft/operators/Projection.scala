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
  * Spec-only surface (like streaming/multimodal): eigenvector signs
  * are implementation-defined, so coordinates are not
  * oracle-checkable; the spec asserts the invariants instead
  * (variance ordering, standardization, determinism).
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
    val coords = model.transform(fv)
      .select(col(idCol), vector_to_array(col("pc")).as("c"))
      .select(col(idCol),
        element_at(col("c"), 1).as("rx"), element_at(col("c"), 2).as("ry"))
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
}

/** Cast helper kept separate so Projection's MLlib imports stay
  * contained (array_to_vector requires array<double>).
  */
private[operators] object VectorFnsCast {
  def toDoubleArray(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(c, x => x.cast("double"))
}
