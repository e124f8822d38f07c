package graft.operators

import org.apache.spark.ml.clustering.{KMeans => MLKMeans, KMeansModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib-backed alternate fit path (BASELINE.json `spark_approach`).
  *
  * Same `YH(i, Y: array<double>)` contract as [[KMeans]]; used as a
  * cross-check oracle for centroid quality (cost comparability), not
  * hash-equality — MLlib's k-means|| init and row-order-dependent float sums
  * are not bit-reproducible against DuckDB.
  */
object KMeansML {

  final case class MLFit(model: KMeansModel, cost: Double)

  def fit(points: DataFrame, k: Int, seed: Long = 42L, maxIter: Int = 50,
      tol: Double = 1e-4): MLFit = {
    val feats = points.select(col("i"), array_to_vector(col("Y")).as("features"))
    val model = new MLKMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter).setTol(tol)
      .fit(feats)
    MLFit(model, model.summary.trainingCost)
  }

  /** Assignment through the fitted model: (i, j) with j 1-based to match the
    * reference's centroid ids.
    */
  def transform(fit: MLFit, points: DataFrame): DataFrame = {
    val feats = points.select(col("i"), array_to_vector(col("Y")).as("features"))
    fit.model.transform(feats)
      .select(col("i"), (col("prediction") + 1).cast("long").as("j"))
  }

  def centroids(fit: MLFit): Seq[KMeans.Centroid] =
    fit.model.clusterCenters.zipWithIndex.map { case (v, ix) =>
      KMeans.Centroid(ix + 1L, v.toArray.toSeq)
    }.toSeq

  /** Bisecting (divisive hierarchical) k-means — MLlib's top-down variant:
    * start from one cluster, repeatedly split the largest until k leaves.
    * More stable than Lloyd under bad seeding and gives a cluster TREE;
    * the flat leaves serve the same assignment contract. Rows-only like
    * [[fit]] (same non-bit-reproducible float path); cost comparability vs
    * the flat fits is pinned in KMeansSpec.
    */
  final case class BisectingFit(
      model: org.apache.spark.ml.clustering.BisectingKMeansModel, cost: Double)

  def fitBisecting(points: DataFrame, k: Int, seed: Long = 42L,
      maxIter: Int = 20): BisectingFit = {
    val feats = points.select(col("i"), array_to_vector(col("Y")).as("features"))
    val model = new org.apache.spark.ml.clustering.BisectingKMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(feats)
    BisectingFit(model, model.summary.trainingCost)
  }

  def transformBisecting(fit: BisectingFit, points: DataFrame): DataFrame = {
    val feats = points.select(col("i"), array_to_vector(col("Y")).as("features"))
    fit.model.transform(feats)
      .select(col("i"), (col("prediction") + 1).cast("long").as("j"))
  }
}
