package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TRAINABLE quality filter — the fasttext-style classifier step of a
  * training-data pipeline (heuristic gates bootstrap weak labels, a model
  * generalizes them), on MLlib logistic regression.
  *
  * Weak labels come from the cheap rule ([[TextAnalysis.qualityScore]]'s
  * keep flag: token range + punctuation cap); features are the OTHER
  * quality signals (stopword density, digit density, scaled length), so
  * the model has to learn correlated structure rather than copy the rule.
  * Distributed shape: feature extraction is the per-row zero-shuffle
  * census, LBFGS aggregates gradients tree-wise — the classic
  * embarrassingly-parallel fit. Like `km_fit_mllib`, the query is
  * rows-only for the driver gate: LBFGS float reductions are not
  * bit-reproducible against a SQL oracle; the SPEC pins behavior instead
  * (near-perfect accuracy on separable synthetic data).
  */
object QualityModel {

  def trainScore(docs: DataFrame, maxIter: Int = 25, reg: Double = 0.01)
      : DataFrame = {
    val feats = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("keep").cast("double").as("label"),
        array(col("stop_ratio"), col("digit_ratio"),
          (col("n_tokens") / 1000.0)).as("farr"))
      .withColumn("features", array_to_vector(col("farr")))
      .cache()
    try {
      val model = new LogisticRegression()
        .setMaxIter(maxIter).setRegParam(reg)
        .fit(feats)
      model.transform(feats)
        .select(col("doc_id"), col("label").cast("long").as("label"),
          col("prediction").cast("long").as("pred"),
          round(element_at(vector_to_array(col("probability")), 2) * 1e6)
            .cast("long").as("p1_e6"))
    } finally feats.unpersist()
  }
}
