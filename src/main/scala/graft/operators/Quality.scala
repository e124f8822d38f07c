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
    val msq = graft.plans.native.nearest_sq_dist(col("Y"), cs.map(_.c))
    points.select(msq.as("msq"))
      .agg(
        sumFx(sqrt(col("msq")), d1Scale).as("elbow_d1"),
        sumFx(col("msq"), d2Scale).as("elbow_d2"))
  }

  /** Davies–Bouldin + Calinski–Harabasz indices for a centroid set — the
    * two standard choose-K validity indices next to the reference's
    * elbow/silhouette (Davies & Bouldin 1979; Caliński & Harabasz 1974).
    * One row `(db_index, ch_index)`; lower DB / higher CH = better.
    *
    * Fixed-point discipline throughout so the DuckDB oracle hash-matches:
    * per-cluster scatters `s_j` and the global means are fixed-point sums;
    * the k per-cluster DB maxes and the k between-variance terms are
    * rounded to integers BEFORE the final k-row sum (doubles would sum in
    * engine-dependent order); every division chain is the identical IEEE
    * sequence on identical inputs.
    *
    * Scale: one shuffle over the assigned points (partial/final per-cluster
    * aggregation) + k-row arithmetic. `assigned` = output of
    * [[KMeans.assign]] joined coordinates — here recomputed from `cs`
    * literals so the operator is self-contained.
    */
  def validityIndices(points: DataFrame, cs: Seq[Centroid],
      sScale: Double = 1e4, dbScale: Double = 1e6,
      bScale: Double = 1e2, wScale: Double = 1e2): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    val k = cs.size
    val dim = cs.head.c.size
    val csDf = cs.map(c => (c.j, c.c)).toDF("j", "C")
    // ONE scan: per-cluster count, scatter sum (sqrt distances), within sum
    // (squared distances), and per-dimension coordinate sums — all as exact
    // longs. The per-cluster partials reassemble every global total the two
    // indices need (integer sums are order-independent), so W and the
    // global mean come for free instead of costing extra scans.
    val d2 = sqDist(col("Y"), col("C"))
    val perAggs =
      Seq(count(lit(1)).as("n"),
        sum(round(sqrt(d2) * sScale).cast("long")).as("sdL"),
        sum(round(d2 * wScale).cast("long")).as("wL")) ++
      (0 until dim).map(d =>
        sum(round(element_at(col("Y"), d + 1) * sScale).cast("long")).as(s"xL$d"))
    val rows = KMeans.assign(points, cs).join(broadcast(csDf), "j")
      .groupBy("j").agg(perAggs.head, perAggs.tail: _*)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          (0 until dim).map(d => r.getLong(4 + d)))
      }.sortBy(_._1)
    // driver arithmetic replicates the oracle SQL's exact op sequences on
    // the k collected rows (roundHalfUpLong = Spark/DuckDB round)
    val byJ = cs.map(c => c.j -> c.c).toMap
    def sqd(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var d = 0
      while (d < a.length) { val t = a(d) - b(d); s += t * t; d += 1 }
      s
    }
    val scatter = rows.map { case (j, n, sdL, _, _) =>
      j -> (sdL.toDouble / sScale) / n
    }.toMap
    val mxSum = rows.map { case (ji, _, _, _, _) =>
      val mx = rows.collect { case (jj, _, _, _, _) if jj != ji =>
        (scatter(ji) + scatter(jj)) / math.sqrt(sqd(byJ(ji), byJ(jj)))
      }.max
      KMeans.roundHalfUpLong(mx * dbScale)
    }.sum
    val dbIndex = mxSum.toDouble / dbScale / k
    val nTot = rows.map(_._2).sum
    val w = rows.map(_._4).sum.toDouble / wScale
    val g = (0 until dim).map(d =>
      rows.map(_._5(d)).sum.toDouble / sScale / nTot)
    val b = rows.map { case (j, n, _, _, _) =>
      KMeans.roundHalfUpLong((n * sqd(byJ(j), g)) * bScale)
    }.sum.toDouble / bScale
    val ch =
      if (k > 1 && nTot > k) (b / (k - 1)) / (w / (nTot - k)) else Double.NaN
    Seq((dbIndex, ch)).toDF("db_index", "ch_index")
  }

  /** The reference's second entry point — the OptimalK sweep (reference
    * OptimalK.sql:3-21, README.md:39-43): run a full fit for each candidate
    * k and emit one row (k, elbow_d1, elbow_d2, silhouette) so the user can
    * eyeball the knee / silhouette peak. The reference drives this from the
    * shell around OptimalK.sql; here the loop is the driver, like
    * [[KMeans.fit]].
    *
    * `sample` is the silhouette pre-sample (the pair stage is O(|sample|²)
    * — see [[silhouettePairStats]]); `points` should be cached by the
    * caller, since each k re-scans it (seeding + Lloyd loop + elbow).
    */
  def optimalKSweep(points: DataFrame, sample: DataFrame, dim: Int, ks: Seq[Int],
      seed: Long = 42L, d1Scale: Double = 1e6, d2Scale: Double = 1e6,
      maxIter: Int = 50): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    ks.map { k =>
      val fit = KMeans.fit(points, k = k, dim = dim, seed = seed,
        plusPlus = true, maxIter = maxIter)
      val e = elbow(points, fit.centroids, d1Scale, d2Scale).head()
      val si = silhouetteSimplified(KMeans.assign(sample, fit.centroids))
        .select(col("si")).head()
      (k.toLong, e.getDouble(0), e.getDouble(1),
        if (si.isNullAt(0)) Double.NaN else si.getDouble(0))
    }.toDF("k", "elbow_d1", "elbow_d2", "silhouette")
  }

  /** OptimalK curve over NESTED seed prefixes (centroid set for k is
    * `seeds.take(k)`) — the fully relational, oracle-able form of the sweep:
    * one row (k, elbow_d1, elbow_d2, si) per k.
    *
    * Scale shape (why this isn't a loop over [[elbow]] + [[silhouetteSimplified]]):
    *  - ALL elbows come from ONE scan of `points`: the per-k nearest-distance
    *    folds are just ks.size expressions in a single multi-aggregate
    *    projection, unpivoted with `stack`. No repeated scans.
    *  - The silhouette sample is scanned/collected ONCE; each k is then one
    *    [[silhouettePairStats]] kernel pass over the redistributed in-memory
    *    sample (per-k labels change which cluster a pair's distance lands in,
    *    so the per-k stats differ, but no pass ever touches `points` again
    *    and no |sample|² rows are materialized).
    *  - Nesting makes both elbows provably monotone non-increasing in k (a
    *    min over a superset of centroids can't grow) — QualitySpec asserts it.
    *
    * Value-identity: each per-k silhouette regroups the same `round(d·dScale)`
    * longs that [[silhouetteSimplified]] sums, and long sums are associative,
    * so each per-k row is bit-identical to running the single-k operators.
    *
    * The sample collect is GUARDED like [[silhouettePairStats]]'s: a
    * `take(maxCollectRows + 1)` instead of a blind collect, and past the
    * bound every per-k silhouette runs [[silhouettePairStatsJoin]]'s fully
    * distributed kernel over the (cached) distributed sample — bit-identical
    * results (long-sum associativity), no O(n) driver materialization ever.
    */
  def optimalKNested(points: DataFrame, sample: DataFrame, seeds: Seq[Centroid],
      ks: Seq[Int], d1Scale: Double = 1e6, d2Scale: Double = 1e6,
      dScale: Double = 1e3, maxCollectRows: Int = 1000000): DataFrame = {
    require(ks.nonEmpty && ks.max <= seeds.size, s"need ${ks.max} seeds, got ${seeds.size}")
    val spark = points.sparkSession
    // -- elbows: one scan, 2·ks.size fixed-point sums, stack() to rows
    val elbowAggs = ks.flatMap { k =>
      val msq = graft.plans.native.nearest_sq_dist(col("Y"), seeds.take(k).map(_.c))
      Seq(sumFx(sqrt(msq), d1Scale).as(s"d1_$k"), sumFx(msq, d2Scale).as(s"d2_$k"))
    }
    val elbows = points.agg(elbowAggs.head, elbowAggs.tail: _*)
      .select(expr(s"stack(${ks.size}, " +
        ks.map(k => s"CAST($k AS BIGINT), d1_$k, d2_$k").mkString(", ") +
        ") AS (k, elbow_d1, elbow_d2)"))
    // -- silhouettes: collect the sample once (guarded take), one kernel pass
    // per k over the local relation (assignment is the same argmin fold as
    // KMeans.assign); past the bound, the distributed join kernel per k over
    // the cached distributed sample — same integer sums, zero driver rows
    val selSample = sample.select(col("i"), col("Y"))
    val sampleRows = selSample.take(maxCollectRows + 1)
    val sil =
      if (sampleRows.length > maxCollectRows) {
        val dist = selSample.cache()
        ks.map { k =>
          val stats = silhouettePairStatsJoin(
            KMeans.assign(dist, seeds.take(k)), dScale)
          silhouetteSimplifiedFromStats(stats, dScale)
            .select(lit(k.toLong).as("sk"), col("si"))
        }.reduce(_ unionAll _)
      } else {
        val sampleLocal = spark.createDataFrame(
          java.util.Arrays.asList(sampleRows: _*), selSample.schema)
        ks.map { k =>
          val stats = silhouettePairStats(
            KMeans.assign(sampleLocal, seeds.take(k)), dScale)
          silhouetteSimplifiedFromStats(stats, dScale)
            .select(lit(k.toLong).as("sk"), col("si"))
        }.reduce(_ unionAll _)
      }
    elbows.join(sil, col("k") === col("sk"))
      .select(col("k"), col("elbow_d1"), col("elbow_d2"), col("si"))
  }

  /** Gap statistic over NESTED seed prefixes — the fully relational,
    * oracle-able sibling of [[gapStatistic]], exactly as [[optimalKNested]]
    * is to [[optimalKSweep]]: the centroid set for k is `seeds.take(k)` on
    * the data side and the k lowest-id reference draws on each reference
    * side (no iterative fit anywhere, so every W term is ANSI-SQL
    * expressible and the DuckDB oracle hash-matches).
    *
    * Reference draws are TRANSPARENT-hash uniforms (an LCG over the row id:
    * `((i·A_bd + C_bd) mod M)/M` stretched to the data's bounding box —
    * per-(set, dim) MULTIPLIERS, see [[gapLcgA]], so sets are not
    * translations of each other and coordinates are not collinear), not
    * Spark's xxhash64 — the whole point is that the oracle can replay them
    * in SQL, the same discipline as [[graft.Dedup]]'s minhash constants.
    * Deterministic under any partitioning by construction.
    *
    * Scale shape: one box-agg scan + ONE multi-aggregate scan computing all
    * (refSets+1)·|ks| fixed-point dispersions in a single pass (the
    * reference coordinates are expressions over `i`, never materialized);
    * only (refSets+1)·|ks| scalars reach the driver. The log / mean / sd
    * arithmetic runs driver-side in the EXACT operation order the oracle
    * SQL writes (mean = (l0+l1+l2)/3.0 etc.), and `chosen` compares the
    * e6-rounded integers (not raw doubles) so the pick is engine-exact.
    *
    * `scale` follows the elbow's d2Scale convention (SMALL for SQUARED
    * sums): with seeds that are arbitrary nested prefixes, per-row msq
    * reaches the squared box diagonal (~3.6e11 on orders coordinates), so
    * a 1e4 scale overflows the Long sum at a few thousand rows — the exact
    * overflow ANSI mode catches at sf0.1 and DuckDB would refuse at any
    * size. 0.01 keeps the per-row term ≤ ~4e9, leaving ~2^31 headroom on
    * row count, and costs nothing after the log (relative error ~1e-13).
    */
  def gapStatisticNested(points: DataFrame, dim: Int, ks: Seq[Int],
      seeds: Seq[Centroid], refSets: Int = 3, scale: Double = 0.01): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.max <= seeds.size,
      s"need ascending ks with ${ks.max} seeds")
    val spark = points.sparkSession
    import spark.implicits._
    val lcgM = GapLcgM
    def lcgA(b: Int, d: Int): Long = gapLcgA(b, dim, d)
    def lcgC(b: Int, d: Int): Long = GapLcgC0 + (b * dim + d).toLong * GapLcgCStep
    // bounding box of the data (exact: min/max are comparisons, no rounding)
    val boxAggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(col("Y"), d + 1)).as(s"lo_$d"),
        max(element_at(col("Y"), d + 1)).as(s"hi_$d"))
    }
    val box = points.agg(boxAggs.head, boxAggs.tail: _*).head()
    val lo = (0 until dim).map(d => box.getDouble(2 * d))
    val hi = (0 until dim).map(d => box.getDouble(2 * d + 1))
    // one reference coordinate vector per existing row id (same cardinality
    // as the data, zero materialization — pure column expressions over i)
    def refY(b: Int): Column = array((0 until dim).map { d =>
      ((col("i") * lcgA(b, d) + lcgC(b, d)) % lcgM).cast("double") /
        lcgM.toDouble * (hi(d) - lo(d)) + lo(d)
    }: _*)
    // reference-side nested seeds: the draws at the ks.max smallest ids,
    // computed with the identical integer-then-double op sequence
    val seedIds = points.select(col("i")).orderBy("i").limit(ks.max)
      .collect().map(_.getLong(0)).toSeq
    def refSeeds(b: Int): Seq[Seq[Double]] = seedIds.map { i =>
      (0 until dim).map { d =>
        ((i * lcgA(b, d) + lcgC(b, d)) % lcgM).toDouble /
          lcgM.toDouble * (hi(d) - lo(d)) + lo(d)
      }
    }
    // ONE scan: all (refSets+1)·|ks| fixed-point dispersions together
    val aggs = ks.flatMap { k =>
      sumFx(graft.plans.native.nearest_sq_dist(
        col("Y"), seeds.take(k).map(_.c)), scale).as(s"wd_$k") +:
        (0 until refSets).map(b => sumFx(graft.plans.native.nearest_sq_dist(
          refY(b), refSeeds(b).take(k)), scale).as(s"wr_${b}_$k"))
    }
    val w = points.agg(aggs.head, aggs.tail: _*).head()
    def wOf(name: String): Double = w.getDouble(w.fieldIndex(name))
    // driver-side scalar math, op-for-op the oracle SQL's expressions
    val stats = ks.map { k =>
      val ls = (0 until refSets).map(b => math.log(wOf(s"wr_${b}_$k")))
      val mean = ls.reduce(_ + _) / refSets.toDouble
      val gap = mean - math.log(wOf(s"wd_$k"))
      val sd = math.sqrt(ls.map(l => (l - mean) * (l - mean)).reduce(_ + _) /
        refSets.toDouble)
      val sk = sd * math.sqrt(1.0 + 1.0 / refSets.toDouble)
      (k.toLong, math.round(gap * 1e6), math.round(sk * 1e6))
    }
    val chosen = stats.zip(stats.drop(1)).collectFirst {
      case ((k, g, _), (_, gN, skN)) if g >= gN - skN => k
    }.getOrElse(ks.max.toLong)
    stats.map { case (k, g, sk) => (k, g, sk, if (k == chosen) 1L else 0L) }
      .toDF("k", "gap_e6", "sk_e6", "chosen")
  }

  /** LCG constants for [[gapStatisticNested]]'s reference draws — small
    * enough that `i·A + C` stays far below 2^63 for any realistic key space
    * (DuckDB ERRORS on BIGINT overflow rather than wrapping, so the oracle
    * must never overflow).
    */
  val GapLcgA = 1103515245L
  val GapLcgM = 2147483647L
  val GapLcgC0 = 12345L
  val GapLcgCStep = 999983L

  /** Per-(set, dim) LCG MULTIPLIER for the gap reference draws,
    * `A + (b·dim + d)·AStep`. A single shared multiplier with per-(b, d)
    * additive constants makes every draw an affine translate of the same
    * underlying sequence mod M: reference SETS become translations of each
    * other (their fitted dispersions agree to wraparound noise, so the
    * Tibshirani s_k collapses to ~0) and, within a set, the x and y draws
    * differ by a constant (the "uniform box" degenerates to wrapped
    * diagonal lines). Distinct multipliers (any nonzero value works — M is
    * prime, so each is a bijection mod M, preserving uniformity)
    * decorrelate both. Kept small enough that `i·A_bd` stays far below
    * 2^63 for any realistic key space.
    */
  val GapLcgAStep = 999983L
  def gapLcgA(b: Int, dim: Int, d: Int): Long =
    GapLcgA + (b * dim + d).toLong * GapLcgAStep

  /** The shared O(n²) stage behind BOTH silhouette variants: for every
    * (point i1 in cluster j1, other cluster j2) the exact integer sum of
    * rounded pair distances (`sfx = Σ round(d·dScale)`) and the pair count.
    * n_points × k rows — tiny; both [[silhouetteRousseeuw]] and
    * [[silhouetteSimplified]] derive from it EXACTLY (long sums are
    * associative, so any regrouping is value-identical), which lets callers
    * run the quadratic pair stage once and reuse it.
    *
    * Default implementation: the fused [[graft.plans.PairDistStats]] kernel.
    * The sample is collected (tiny BY CONTRACT — it is the thing being
    * squared; at scale `assigned` must be a deterministic pre-sample, columns
    * (i, Y, j)), redistributed across the cluster, and every row computes its
    * per-cluster stats against the plan-shipped sample inside whole-stage
    * codegen. The O(n²) arithmetic is unchanged, but no |sample|² rows are
    * ever materialized or shuffled — at sf0.1 (6.5k sample, 42.5M pairs) this
    * is ~50× faster than the join form below, and it parallelizes over the
    * repartitioned sample instead of serializing through a
    * BroadcastNestedLoopJoin over a single-partition stream side.
    * Value-identity with the join form is pinned in QualitySpec.
    *
    * The "tiny by contract" clause is ENFORCED, not assumed: the collect is
    * a `take(maxCollectRows + 1)`, and if the sample overflows the bound the
    * operator falls back to [[silhouettePairStatsJoin]]'s fully distributed
    * kernel (same integer pair stats — long sums are associative, so the
    * two forms are bit-identical; ScaleSpec pins the seam). A caller that
    * mis-sizes its sample gets a slower distributed plan, never an O(n)
    * driver materialization — the `memoMaxRows` discipline of
    * SparkEntry.docComponents applied to the kernel itself.
    */
  def silhouettePairStats(assigned: DataFrame, dScale: Double = 1e3,
      maxCollectRows: Int = 1000000): DataFrame = {
    val spark = assigned.sparkSession
    val sel = assigned.select(col("i"), col("j"), col("Y"))
    val rows = sel.take(maxCollectRows + 1)
    if (rows.length > maxCollectRows)
      return silhouettePairStatsJoin(assigned, dScale)
    val ids = rows.map(_.getLong(0))
    val js = rows.map(_.getLong(1))
    val ys = rows.map(_.getSeq[Double](2).toArray)
    val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism, rows.length))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), sel.schema)
      .repartition(slices)
      .select(col("i").as("i1"), col("j").as("j1"),
        explode(graft.plans.native.pair_dist_stats(
          col("i"), col("Y"), ids, js, ys, dScale)).as("st"))
      .select(col("i1"), col("j1"), col("st").getField("j2").as("j2"),
        col("st").getField("sfx").as("sfx"), col("st").getField("cnt").as("cnt"))
  }

  /** The pair stage as an explicit relational O(n²) self-join — the form the
    * reference's OptimalK.sql:19 writes, kept as the executable spec that
    * [[silhouettePairStats]]'s kernel is pinned against (QualitySpec) and as
    * the fallback if the sample can't be collected. Non-equi self-join
    * (`i1 =!= i2`) ⇒ BroadcastNestedLoopJoin materializing |sample|² rows.
    */
  def silhouettePairStatsJoin(assigned: DataFrame, dScale: Double = 1e3): DataFrame = {
    val a = assigned.select(col("i").as("i1"), col("Y").as("Y1"), col("j").as("j1"))
    val b = assigned.select(col("i").as("i2"), col("Y").as("Y2"), col("j").as("j2"))
    // native kernel: keep the per-pair work one fused codegen'd loop
    val pairs = a.join(b, col("i1") =!= col("i2"))
      .select(col("i1"), col("j1"), col("j2"),
        round(sqrt(graft.plans.native.sq_dist(col("Y1"), col("Y2"))) * dScale)
          .cast("long").as("dfx"))
    pairs.groupBy("i1", "j1", "j2")
      .agg(sum("dfx").as("sfx"), count(lit(1)).as("cnt"))
  }

  /** Textbook per-point Rousseeuw silhouette, averaged: for each point,
    * a(i) = mean distance to its own cluster's other members, b(i) = min
    * over other clusters of the mean distance to that cluster,
    * s(i) = (b−a)/max(a,b); the output is mean s(i) — the standard quality
    * score the reference's simplified global form approximates. All means
    * derive from fixed-point integer sums so the DuckDB oracle matches
    * bit-for-bit.
    */
  def silhouetteRousseeuw(assigned: DataFrame, dScale: Double = 1e3,
      siScale: Double = 1e6): DataFrame =
    silhouetteRousseeuwFromStats(silhouettePairStats(assigned, dScale), dScale, siScale)

  /** Rousseeuw silhouette from a precomputed [[silhouettePairStats]]
    * intermediate (same dScale). Value-identical to computing from pairs
    * directly: `md = sfx/dScale/cnt` is the exact per-(point, cluster) mean.
    */
  def silhouetteRousseeuwFromStats(stats: DataFrame, dScale: Double = 1e3,
      siScale: Double = 1e6): DataFrame = {
    val toCluster = stats.select(col("i1"), col("j1"), col("j2"),
      (col("sfx").cast("double") / dScale / col("cnt")).as("md"))
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
  def silhouetteSimplified(assigned: DataFrame, dScale: Double = 1e3): DataFrame =
    silhouetteSimplifiedFromStats(silhouettePairStats(assigned, dScale), dScale)

  /** Simplified global silhouette from a precomputed
    * [[silhouettePairStats]] intermediate (same dScale). The global
    * conditional sums are regroupings of the per-point integer sums, so the
    * result is bit-identical to the direct pair aggregation.
    */
  def silhouetteSimplifiedFromStats(stats: DataFrame, dScale: Double = 1e3): DataFrame = {
    val same = col("j1") === col("j2")
    def condAvg(cond: Column): Column =
      (sum(when(cond, col("sfx"))).cast("double") / dScale) /
        sum(when(cond, col("cnt")).otherwise(0L))
    stats
      .agg(condAvg(same).as("ai"), condAvg(!same).as("bi"))
      .select(col("ai"), col("bi"),
        ((col("bi") - col("ai")) / greatest(col("ai"), col("bi"))).as("si"))
  }

  /** Gap statistic with REAL per-k fits on both sides, in the
    * ORACLE-REPLAYABLE bounded form — the km_fit2_exact / km_wcr_log
    * discipline applied to the fitted gap (the emb_pq_fitted move: replace
    * the non-replayable fit internals with deterministic machinery the
    * oracle can unroll, keep the fit real):
    *  - seeding per set is NESTED exact inverse-CDF k-means++
    *    ([[KMeans.seedNextInverseCdf]], the reference's `centroidsInit`
    *    machinery): first centroid = min-key point, then `ks.max − 1`
    *    D²-weighted draws with FIXED RATIONAL u's (integer-domain threshold
    *    compare — bit-reproducible in ANSI SQL); the k-fit starts from the
    *    first k seeds, so seeding cost is shared across the sweep;
    *  - each (set, k) fit is `fitFrom`'s movement-gated Lloyd loop bounded
    *    at `lloydSteps` iterations (fixed-point 1e4 re-averages, tol-gated
    *    stop — exactly the km_wcr_log unrolled-CTE contract);
    *  - reference sets are the SAME transparent-LCG uniforms as
    *    [[gapStatisticNested]] (pure functions of the row id);
    *  - dispersions, log/mean/sd math and the e6-integer `chosen` compare
    *    are op-for-op [[gapStatisticNested]]'s.
    * "Fitting both sides" is what makes the criterion fire (see
    * [[gapStatistic]]); bounding the fit at `lloydSteps` movement-gated
    * iterations is the published cost of hash-exactness — on data where
    * Lloyd converges within the budget the two forms coincide.
    *
    * Scale shape: per set, the ++ draws are the two-level-prefix-sum form
    * (no single-partition window at scale) and each Lloyd step is the
    * one-pass sufficient-stats scan; the `refSets + 1` set chains are
    * independent and run concurrently (the [[gapStatistic]] pool rule).
    * Below `localMaxRows` the whole chain instead runs DRIVER-LOCAL with
    * bit-identical results (the fitAuto discipline, pinned in QualitySpec):
    * at sample sizes the distributed form is ~130 tiny jobs of pure fixed
    * cost, while past the threshold the distributed chain takes over
    * unchanged.
    */
  def gapStatisticFitted(points: DataFrame, dim: Int, ks: Seq[Int],
      refSets: Int = 3, scale: Double = 0.01, tol: Double = 0.01,
      lloydSteps: Int = 3, fxScale: Double = 1e4,
      localMaxRows: Long = -1L): DataFrame = {
    // localMaxRows = -1 (default) → derive from the fitBounded CELL budget
    // (r19): the collected thing is rows × dim doubles, so the row bound
    // should scale with 1/dim, not sit at a constant — the old 100k-row
    // default left the sf0.1 2-D orders binding (150k rows, 300k cells) on
    // the ~130-job distributed path this local twin exists to avoid, for
    // the sake of a bound meant to protect against 64-D collects.
    // localMaxRows = 0 still forces the distributed chain (the QualitySpec
    // parity seam); an explicit positive bound is honored as before.
    val localRowBound =
      if (localMaxRows >= 0) localMaxRows
      else 4000000L / math.max(dim, 1)
    require(ks.nonEmpty && ks == ks.sorted, "need ascending ks")
    val spark = points.sparkSession
    import spark.implicits._
    val kMax = ks.max
    // fixed rational draws for rounds 2..kMax — the shared KMeans.FixedUs
    // sequence (also fitBounded's), so every bounded-replayable fit and its
    // oracle agree on one u schedule
    def uOf(r: Int): (Long, Long) = KMeans.fixedU(r)
    val boxAggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(col("Y"), d + 1)).as(s"lo_$d"),
        max(element_at(col("Y"), d + 1)).as(s"hi_$d"))
    }
    val box = points.agg(boxAggs.head, boxAggs.tail: _*).head()
    val lo = (0 until dim).map(d => box.getDouble(2 * d))
    val hi = (0 until dim).map(d => box.getDouble(2 * d + 1))
    def lcgC(b: Int, d: Int): Long = GapLcgC0 + (b * dim + d).toLong * GapLcgCStep
    def refDf(b: Int): DataFrame = points.select(col("i"),
      array((0 until dim).map { d =>
        ((col("i") * gapLcgA(b, dim, d) + lcgC(b, d)) % GapLcgM).cast("double") /
          GapLcgM.toDouble * (hi(d) - lo(d)) + lo(d)
      }: _*).as("Y"))
    val sets: Seq[DataFrame] = points +: (0 until refSets).map(refDf)

    // ------------------------------------------------- driver-local fast path
    // The fitAuto discipline: below `localMaxRows` the whole
    // seed→fit→census chain runs driver-local with BIT-IDENTICAL results
    // (pinned in QualitySpec) — the distributed form's ~130 tiny jobs are
    // pure fixed cost at sample sizes, while at real scale the distributed
    // chain below takes over unchanged. Every rounding uses BigDecimal
    // HALF_UP (Spark's `round`), every float fold walks the same order.
    def localW(): Seq[Seq[Double]] = {
      val base = points.select(col("i"), col("Y")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
      // KMeans.roundHalfUpLong ≡ the BigDecimal HALF_UP form (PropertySpec
      // pin) — the old per-call BigDecimal here ran millions of times per
      // sweep (every point, every Lloyd step, every set) and dominated the
      // local path's wall (r19)
      def rnd(x: Double): Long = KMeans.roundHalfUpLong(x)
      def sqd(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var d = 0
        while (d < dim) { val t = a(d) - b(d); s += t * t; d += 1 }
        s
      }
      def minSq(y: Array[Double], cs: Seq[Array[Double]]): Double =
        cs.map(c => sqd(y, c)).min
      def sameY(a: Array[Double], b: Array[Double]): Boolean =
        (0 until dim).forall(d => a(d) == b(d)) // SQL value equality
      def refCoords(b: Int): Array[(Long, Array[Double])] =
        base.map { case (i, _) =>
          (i, Array.tabulate(dim) { d =>
            ((i * gapLcgA(b, dim, d) + lcgC(b, d)) % GapLcgM).toDouble /
              GapLcgM.toDouble * (hi(d) - lo(d)) + lo(d)
          })
        }
      def wOfSetLocal(pts: Array[(Long, Array[Double])]): Seq[Double] = {
        // nested ++ seeds: min-key first, then rational inverse-CDF draws
        var chosen = Vector(pts.head._2)
        (2 to kMax).foreach { r =>
          val (uN, uD) = uOf(r)
          val surv = pts.filter { case (_, y) =>
            !chosen.exists(c => sameY(c, y)) }
          val ws = surv.map { case (_, y) => rnd(minSq(y, chosen)) }
          val total = ws.sum
          var cw = 0L; var pick = -1; var ix = 0
          while (ix < surv.length && pick < 0) {
            cw += ws(ix)
            if (cw * uD >= total * uN) pick = ix
            ix += 1
          }
          require(pick >= 0, s"k-means++ draw $r returned no row")
          chosen = chosen :+ surv(pick)._2
        }
        // per k: movement-gated Lloyd (fixed-point re-averages), then the
        // fixed-point dispersion census
        ks.map { k =>
          var cs: Seq[(Long, Array[Double])] =
            (1 to k).map(j => (j.toLong, chosen(j - 1)))
          var move = Double.MaxValue
          var step = 0
          while (move >= tol && step < lloydSteps) {
            step += 1
            val acc = scala.collection.mutable.LongMap
              .empty[(Array[Long], Long)]
            pts.foreach { case (_, y) =>
              var bj = -1L; var bd = Double.PositiveInfinity
              cs.foreach { case (j, c) =>
                val d2 = sqd(y, c)
                if (d2 < bd) { bd = d2; bj = j } // strict <: earliest j wins
              }
              val cur = acc.getOrElse(bj, (new Array[Long](dim), 0L))
              var d = 0
              while (d < dim) { cur._1(d) += rnd(y(d) * fxScale); d += 1 }
              acc.update(bj, (cur._1, cur._2 + 1))
            }
            val next = acc.toSeq.sortBy(_._1).map { case (j, (sums, n)) =>
              (j, sums.map(s => s.toDouble / fxScale / n))
            }
            val byJ = cs.map { case (j, c) => j -> c }.toMap
            move = next.flatMap { case (j, c) =>
              byJ.get(j).map(p => math.sqrt(sqd(p, c)))
            }.sum
            cs = next
          }
          val cents = cs.map(_._2)
          pts.map { case (_, y) => rnd(minSq(y, cents) * scale) }
            .sum.toDouble / scale
        }
      }
      (base +: (0 until refSets).map(refCoords)).map(wOfSetLocal)
    }

    // per set: nested ++ seeds, one bounded fit per k, ONE multi-agg
    // dispersion scan over all ks
    def wOfSet(df0: DataFrame): Seq[Double] = {
      val df = df0.cache()
      try {
        var seeds = KMeans.seedFirstK(df, 1)
        (2 to kMax).foreach { r =>
          val (uN, uD) = uOf(r)
          val drawn = KMeans.seedNextInverseCdf(df, seeds,
            uNum = uN, uDen = uD).collect()
          require(drawn.nonEmpty, s"k-means++ draw $r returned no row")
          seeds = seeds :+ Centroid(drawn.head.getLong(0),
            drawn.head.getSeq[Double](2))
        }
        val fitted = ks.map(k => KMeans.fitFrom(df, seeds.take(k), dim,
          tol = tol, maxIter = lloydSteps, fxScale = fxScale).centroids)
        val aggs = ks.zip(fitted).map { case (k, cs) =>
          sumFx(graft.plans.native.nearest_sq_dist(
            col("Y"), cs.map(_.c)), scale).as(s"w_$k")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        ks.indices.map(ix => row.getDouble(ix))
      } finally df.unpersist()
    }
    val ws: Seq[Seq[Double]] =
      if (points.count() <= localRowBound) localW()
      else {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(sets.size)
        try {
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          val fs = sets.map(s => scala.concurrent.Future(wOfSet(s)))
          fs.map(f => scala.concurrent.Await.result(f,
            scala.concurrent.duration.Duration.Inf))
        } finally pool.shutdown()
      }
    // driver-side scalar math, op-for-op the oracle SQL's expressions
    val stats = ks.zipWithIndex.map { case (k, ix) =>
      val ls = (1 to refSets).map(b => math.log(ws(b)(ix)))
      val mean = ls.reduce(_ + _) / refSets.toDouble
      val gap = mean - math.log(ws(0)(ix))
      val sd = math.sqrt(ls.map(l => (l - mean) * (l - mean)).reduce(_ + _) /
        refSets.toDouble)
      val sk = sd * math.sqrt(1.0 + 1.0 / refSets.toDouble)
      (k.toLong, math.round(gap * 1e6), math.round(sk * 1e6))
    }
    val chosen = stats.zip(stats.drop(1)).collectFirst {
      case ((k, g, _), (_, gN, skN)) if g >= gN - skN => k
    }.getOrElse(kMax.toLong)
    stats.map { case (k, g, sk) => (k, g, sk, if (k == chosen) 1L else 0L) }
      .toDF("k", "gap_e6", "sk_e6", "chosen")
  }

  /** Gap statistic (Tibshirani, Walther & Hastie 2001), the textbook form:
    * gap(k) = mean_b log W*_kb − log W_k, where W_k is the D² dispersion of
    * the DATA under its own k-fit and each W*_kb is the dispersion of a
    * uniform reference draw (data's bounding box) under THAT SET'S own
    * k-fit; s_k = sd_b(log W*_kb)·√(1+1/B). `chosen` marks the standard
    * pick — the smallest k with gap(k) ≥ gap(k+1) − s(k+1). Fitting both
    * sides matters: un-fitted dispersion keeps falling past the true k and
    * the criterion never fires.
    *
    * Scale shape: ks·(B+1) fits (each `fitAuto` — driver-local under the
    * size threshold, the distributed loop above it) + one fused
    * box-and-count scan; reference coordinates are pure xxhash64 functions
    * of the row id (deterministic under ANY partitioning — `rand()` is
    * not) and never driver-materialized. Only ks·(B+1) scalars collect.
    */
  def gapStatistic(points: DataFrame, dim: Int, ks: Seq[Int],
      refSets: Int = 3, seed: Long = 42L, scale: Double = 1e4,
      maxIter: Int = 20): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted, "need ascending ks")
    val spark = points.sparkSession
    import spark.implicits._
    val boxAggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(col("Y"), d + 1)).as(s"lo_$d"),
        max(element_at(col("Y"), d + 1)).as(s"hi_$d"))
    }
    val row = points.agg(count(lit(1)).as("n"), boxAggs: _*).head()
    val n = row.getLong(0)
    val lo = (0 until dim).map(d => row.getDouble(1 + 2 * d))
    val hi = (0 until dim).map(d => row.getDouble(2 + 2 * d))
    val m = 1000003L // coordinate resolution of the hash-uniform draw
    def refSet(b: Int): DataFrame = {
      val coordCols = (0 until dim).map { d =>
        val u = pmod(xxhash64(col("id"), lit(seed + b * dim + d)), lit(m))
          .cast("double") / m.toDouble
        u * (hi(d) - lo(d)) + lo(d)
      }
      spark.range(n).select((col("id") + 1).as("i"), array(coordCols: _*).as("Y"))
    }
    def wcss(df: DataFrame, k: Int): Double = {
      // seeding matters twice here: first-k-by-key seeds can land in one
      // true cluster (Lloyd never escapes, inverting the data/reference
      // gap), and rand()-based ++ draws depend on partitioning — k-means||
      // spreads seeds AND keeps the fit a pure function of the data
      val fit = KMeans.fitAuto(df, k = k, dim = dim, seed = seed,
        parallelSeed = true, maxIter = maxIter)
      df.agg(sumFx(graft.plans.native.nearest_sq_dist(
        col("Y"), fit.centroids.map(_.c)), scale).as("w")).head().getDouble(0)
    }
    val refs = (0 until refSets).map(b => refSet(b).cache())
    def safeLog(x: Double) = math.log(math.max(x, 1e-300))
    // the ks·(B+1) fits are independent and dominated by per-fit fixed cost
    // (plan + codegen + scheduling), not data — run them concurrently;
    // values are pure functions of (set, k), so completion order is moot
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(ks.size * (refSets + 1), 24))
    val stats = try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val wF = (for (df <- points +: refs; k <- ks)
        yield (df, k) -> scala.concurrent.Future(wcss(df, k))).toMap
      def w(df: DataFrame, k: Int): Double =
        scala.concurrent.Await.result(wF((df, k)),
          scala.concurrent.duration.Duration.Inf)
      ks.map { k =>
        val logs = refs.map(r => safeLog(w(r, k)))
        val mean = logs.sum / logs.length
        val sd = math.sqrt(logs.map(x => (x - mean) * (x - mean)).sum / logs.length)
        (k, mean - safeLog(w(points, k)), sd * math.sqrt(1.0 + 1.0 / logs.length))
      }
    } finally pool.shutdown()
    refs.foreach(_.unpersist())
    val chosen = stats.zip(stats.drop(1)).collectFirst {
      case ((k, gap, _), (_, gapNext, skNext)) if gap >= gapNext - skNext => k
    }.getOrElse(ks.max)
    stats.map { case (k, gap, sk) =>
      (k.toLong, math.round(gap * 1e6), math.round(sk * 1e6),
        if (k == chosen) 1L else 0L)
    }.toDF("k", "gap_e6", "sk_e6", "chosen")
  }
}
