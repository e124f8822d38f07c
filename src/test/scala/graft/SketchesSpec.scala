package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** KMV source-overlap sketches: estimator accuracy on constructed overlap,
  * saturated-sketch exactness, and the below-shuffle top-k plan shape.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // Token streams with a KNOWN shingle overlap: A = t1..t1500, B = t750..
  // t2250 — the shared 3-gram shingles are exactly those fully inside the
  // 750..1500 overlap window, so J ≈ 1/3 and |A ∪ B| ≈ 2248.
  private def tokenText(from: Int, to: Int): String =
    (from to to).map(i => s"t$i").mkString(" ")

  test("kmvSourceOverlap estimates a constructed 1/3 Jaccard within 4 sigma") {
    val docs = Seq(
      ("A", tokenText(1, 1500)),
      ("B", tokenText(750, 2250))).toDF("source", "text")
    val row = Sketches.kmvSourceOverlap(docs, k = 128).head()
    val (l, inter) = (row.getAs[Long]("l"), row.getAs[Long]("inter"))
    assert(l == 128L, s"sketch must be unsaturated here, got l=$l")
    val j = row.getAs[Long]("jaccard_ppm") / 1e6
    // std err ~ sqrt(J(1-J)/k) = 0.042; accept 4 sigma around 1/3
    assert(j > 0.333 - 0.167 && j < 0.333 + 0.167, s"jaccard $j (inter=$inter)")
    val u = row.getAs[Long]("union_est")
    // (L-1)/L bias + sqrt(k) noise: accept 25% around the true 2248
    assert(u > 2248 * 0.75 && u < 2248 * 1.25, s"union_est $u")
  }

  test("saturated sketches (|union| < k) report the union EXACTLY") {
    val docs = Seq(
      ("C", "a b c d e"), // shingles {abc, bcd, cde}
      ("D", "b c d e f")) // shingles {bcd, cde, def}
      .toDF("source", "text")
    val row = Sketches.kmvSourceOverlap(docs, k = 128).head()
    assert(row.getAs[Long]("l") == 4L)
    assert(row.getAs[Long]("inter") == 2L)
    assert(row.getAs[Long]("jaccard_ppm") == 500000L)
    assert(row.getAs[Long]("union_est") == 4L, "saturated KMV is exact")
  }

  test("the per-source bottom-k runs through the native two-phase top-k " +
      "(partials cut to k BELOW the shuffle)") {
    val docs = Seq(("A", tokenText(1, 200)), ("B", tokenText(100, 300)))
      .toDF("source", "text")
    val plan = Sketches.kmvSourceOverlap(docs, k = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartialTopKPerGroup") && plan.contains("FinalTopKPerGroup"),
      s"expected the native two-phase top-k in:\n$plan")
  }

  test("sketch pair stats are deterministic across partitionings") {
    val docs = Seq(
      ("A", tokenText(1, 800)), ("B", tokenText(400, 1200)),
      ("E", tokenText(600, 1400))).toDF("source", "text")
    val r1 = Sketches.kmvSourceOverlap(docs.repartition(7), k = 64)
      .orderBy("src_a", "src_b").collect().toSeq
    val r2 = Sketches.kmvSourceOverlap(docs.repartition(2), k = 64)
      .orderBy("src_a", "src_b").collect().toSeq
    assert(r1 == r2)
  }
}
