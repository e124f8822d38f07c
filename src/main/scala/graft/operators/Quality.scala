package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._
import graft.operators.KMeans.Centroid

/** Cluster-quality metrics — the reference's `OptimalK.sql`. */
object Quality {

  /** Elbow metric for a centroid set (reference OptimalK.sql:3-8): sum over
    * points of the distance to the nearest centroid. The reference uses PLAIN
    * distance (Quirk Q3 — not textbook WCSS); we emit both: `elbow_d1`
    * (reference semantics) and `elbow_d2` (textbook within-cluster sum of
    * squares). Single aggregated row; fixed-point sums for oracle exactness.
    */
  def elbow(points: DataFrame, cs: Seq[Centroid],
      d1Scale: Double = 1e6, d2Scale: Double = 1e6): DataFrame = {
    val msq = nearestSqDist(col("Y"), cs.map(_.c))
    points.select(msq.as("msq"))
      .agg(
        sumFx(sqrt(col("msq")), d1Scale).as("elbow_d1"),
        sumFx(col("msq"), d2Scale).as("elbow_d2"))
  }

  /** Simplified GLOBAL silhouette (reference OptimalK.sql:10-21): over all
    * point pairs (a ≠ b), `ai` = mean same-cluster distance, `bi` = mean
    * cross-cluster distance, `si = (bi−ai)/max(ai,bi)`. One number, not the
    * per-point Rousseeuw mean. O(n²) pairs — the reference does this over the
    * full table with no sampling (SURVEY.md §6); at scale the caller MUST
    * pre-sample, so `assigned` here is expected to be a (deterministic)
    * sample with columns (i, Y, j).
    */
  def silhouetteSimplified(assigned: DataFrame, dScale: Double = 1e3): DataFrame = {
    val a = assigned.select(col("i").as("i1"), col("Y").as("Y1"), col("j").as("j1"))
    val b = assigned.select(col("i").as("i2"), col("Y").as("Y2"), col("j").as("j2"))
    // native kernel: O(n²) pairs is the reference's own cost model
    // (OptimalK.sql:19) — keep the per-pair work one fused loop
    val pairs = a.join(b, col("i1") =!= col("i2"))
      .select(col("j1"), col("j2"),
        sqrt(graft.plans.native.sq_dist(col("Y1"), col("Y2"))).as("d"))
    val same = col("j1") === col("j2")
    def condAvg(cond: Column): Column =
      (sum(when(cond, round(col("d") * dScale).cast("long"))).cast("double") / dScale) /
        sum(when(cond, 1).otherwise(0))
    pairs
      .agg(condAvg(same).as("ai"), condAvg(!same).as("bi"))
      .select(col("ai"), col("bi"),
        ((col("bi") - col("ai")) / greatest(col("ai"), col("bi"))).as("si"))
  }
}
