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

  /** Textbook per-point Rousseeuw silhouette, averaged: for each point,
    * a(i) = mean distance to its own cluster's other members, b(i) = min
    * over other clusters of the mean distance to that cluster,
    * s(i) = (b−a)/max(a,b); the output is mean s(i) — the standard quality
    * score the reference's simplified global form approximates. Same O(n²)
    * pair space (pre-sample at scale); all means derive from fixed-point
    * integer sums so the DuckDB oracle matches bit-for-bit.
    */
  def silhouetteRousseeuw(assigned: DataFrame, dScale: Double = 1e3,
      siScale: Double = 1e6): DataFrame = {
    val a = assigned.select(col("i").as("i1"), col("Y").as("Y1"), col("j").as("j1"))
    val b = assigned.select(col("i").as("i2"), col("Y").as("Y2"), col("j").as("j2"))
    val pairs = a.join(b, col("i1") =!= col("i2"))
      .select(col("i1"), col("j1"), col("j2"),
        round(sqrt(graft.plans.native.sq_dist(col("Y1"), col("Y2"))) * dScale)
          .cast("long").as("dfx"))
    // mean distance from each point to each cluster (exact integer sums)
    val toCluster = pairs.groupBy("i1", "j1", "j2")
      .agg((sum("dfx").cast("double") / dScale / count(lit(1))).as("md"))
    val ai = toCluster.filter(col("j1") === col("j2"))
      .select(col("i1").as("ia"), col("md").as("a"))
    val bi = toCluster.filter(col("j1") =!= col("j2"))
      .groupBy("i1").agg(min("md").as("b"))
      .select(col("i1").as("ib"), col("b"))
    val si = ai.join(bi, col("ia") === col("ib"))
      .select(((col("b") - col("a")) / greatest(col("a"), col("b"))).as("si"))
    si.agg((sum(round(col("si") * siScale).cast("long")).cast("double") / siScale /
      count(lit(1))).as("mean_si"), count(lit(1)).as("n_points"))
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
