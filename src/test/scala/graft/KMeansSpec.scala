package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.KMeans
import graft.operators.KMeans.Centroid

/** Unit + property coverage for the k-means operators (SURVEY.md §5 plan). */
class KMeansSpec extends SparkSpec {
  /** Absolute WCSS ceiling for the pinned-census quality gate (see the
    * "pinned-census quality gate" test): captured round 17 on the sf0.01
    * fixture — ours 457.5, MLlib 461.7, bisecting 462.0 — pinned at the
    * worst flat cost +10%. */
  private val PinnedFitWcssCeiling = 508.0
  import spark.implicits._

  private def pts(rows: (Long, Seq[Double])*): DataFrame =
    rows.toDF("i", "Y")

  private val squareCorners = pts(
    1L -> Seq(0.0, 0.0), 2L -> Seq(10.0, 0.0), 3L -> Seq(0.0, 10.0), 4L -> Seq(10.0, 10.0))

  test("assign picks the true argmin") {
    val cs = Seq(Centroid(1, Seq(0.0, 0.0)), Centroid(2, Seq(10.0, 10.0)))
    val got = KMeans.assign(squareCorners, cs).select("i", "j").as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(4L) == 2L)
    // (10,0) and (0,10) are equidistant from both centroids -> tie goes to lowest j
    assert(got(2L) == 1L && got(3L) == 1L)
  }

  test("assign tie-break matches the reference's stable sort (lowest j wins)") {
    val cs = Seq(Centroid(3, Seq(5.0, 5.0)), Centroid(7, Seq(5.0, 5.0)))
    val got = KMeans.assign(pts(1L -> Seq(1.0, 1.0)), cs).select("j").as[Long].head()
    assert(got == 3L)
  }

  test("lloyd step computes exact per-cluster per-dimension means") {
    val cs = Seq(Centroid(1, Seq(0.0, 0.0)), Centroid(2, Seq(100.0, 100.0)))
    val data = pts(
      1L -> Seq(1.0, 2.0), 2L -> Seq(3.0, 4.0),          // cluster 1: mean (2,3)
      3L -> Seq(99.0, 98.0), 4L -> Seq(101.0, 102.0))    // cluster 2: mean (100,100)
    val next = KMeans.lloydStep(KMeans.assign(data, cs), dim = 2)
    assert(next == Seq(Centroid(1, Seq(2.0, 3.0)), Centroid(2, Seq(100.0, 100.0))))
  }

  test("empty clusters silently disappear (reference GROUP BY semantics)") {
    val cs = Seq(
      Centroid(1, Seq(0.0, 0.0)), Centroid(2, Seq(10.0, 10.0)),
      Centroid(3, Seq(1e6, 1e6))) // nothing will be nearest to this one
    val next = KMeans.lloydStep(KMeans.assign(squareCorners, cs), dim = 2)
    assert(next.map(_.j) == Seq(1L, 2L))
  }

  test("movement = sum of per-centroid displacement, vanished centroids ignored") {
    val prev = Seq(Centroid(1, Seq(0.0, 0.0)), Centroid(2, Seq(10.0, 0.0)))
    val next = Seq(Centroid(1, Seq(3.0, 4.0))) // moved 5; centroid 2 vanished
    assert(KMeans.movement(prev, next) == 5.0)
  }

  test("k-means++ inverse-CDF round excludes chosen coordinates and honors the draw") {
    // chosen = (0,0); remaining weights (sqdist): p2=100, p3=400, p4=25
    // cum in i-order: p2:100, p3:500, p4:525; u=1/2 -> threshold 262.5 -> p3
    val chosen = Seq(Centroid(1, Seq(0.0, 0.0)))
    val data = pts(
      1L -> Seq(0.0, 0.0), 2L -> Seq(10.0, 0.0), 3L -> Seq(0.0, 20.0), 4L -> Seq(5.0, 0.0))
    val got = KMeans.seedNextInverseCdf(data, chosen, uNum = 1, uDen = 2)
      .select("i").as[Long].head()
    assert(got == 3L)
    // u = 0 edge: first nonzero-cum point wins (p2)
    val got0 = KMeans.seedNextInverseCdf(data, chosen, uNum = 0, uDen = 1)
      .select("i").as[Long].head()
    assert(got0 == 2L)
  }

  test("seedNextInverseCdf's bucketed prefix sum matches the one-window form") {
    import org.apache.spark.sql.expressions.Window
    val yh = Tables.yhOrders(spark, sf("0.001"))
    val chosen = KMeans.seedFirstK(yh, 1)
    val got = KMeans.seedNextInverseCdf(yh, chosen, uNum = 1, uDen = 2).collect().toSeq
    // reference computation: the single-partition global window it replaced
    val chosenDf = chosen.map(_.c).toDF("C")
    val surviving = yh.join(chosenDf, yh("Y") === chosenDf("C"), "left_anti")
    val d2 = graft.functions.VectorOps.nearestSqDist(col("Y"), chosen.map(_.c))
    val weighted = surviving.withColumn("w", round(d2 * 1.0).cast("long"))
    val total = weighted.agg(sum("w")).head().getLong(0)
    val cumW = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = weighted.withColumn("cw", sum("w").over(cumW))
      .filter(col("cw") * 2 >= lit(total) * 1).orderBy("cw", "i").limit(1)
      .select(lit(2L).as("j"), col("i"), col("Y")).collect().toSeq
    assert(got == exp && got.size == 1)
  }

  test("seedNextInverseCdf auto-derives weightScale past the overflow bound " +
      "and preserves the draw") {
    // r17 verdict task 4: a nominal weightScale whose integer total would
    // overflow total·uNum must adapt instead of require-failing. Planted
    // huge weights: distances ~1e8 squared = 1e16 per row; at
    // weightScale = 1e4 the nominal total (~5.25e20) exceeds
    // Long.MaxValue/uDen, which previously threw. The draw itself is
    // scale-invariant here by construction (the adapted uniform rescale
    // preserves relative weights exactly up to rounding, and the planted
    // weights are far apart), so the adapted pick must equal the
    // weightScale = 1 pick.
    val chosen = Seq(Centroid(1, Seq(0.0, 0.0)))
    val data = pts(
      1L -> Seq(0.0, 0.0), 2L -> Seq(1e8, 0.0), 3L -> Seq(0.0, 2e8),
      4L -> Seq(5e7, 0.0))
    def draw(ws: Double): Long =
      KMeans.seedNextInverseCdf(data, chosen, uNum = 1, uDen = 2,
        weightScale = ws).select("i").as[Long].head()
    val base = draw(1.0)          // in-bounds: adaptive branch must not fire
    assert(base == 3L)            // cum 1e16, 5e16, 5.25e16; u=1/2 -> p3
    assert(draw(1e4) == base,     // previously: require failure
      "adaptive rescale changed the draw on well-separated weights")
    // d1/dedup modes share the same head pass — exercise one combined
    assert(KMeans.seedNextInverseCdf(data, chosen, 1, 2, weightScale = 1e4,
      d1Weights = true).select("i").as[Long].head() == 3L)
  }

  test("seedFirstRandom mirrors the reference's randomized offset pick, reproducibly") {
    val data = pts((1L to 200L).map(i => i -> Seq(i.toDouble, -i.toDouble)): _*)
    val a = KMeans.seedFirstRandom(data, seed = 9)
    val b = KMeans.seedFirstRandom(data, seed = 9)
    assert(a == b, "same seed must reproduce the same pick")
    assert(a.head.j == 1L)
    // offset ∈ [1, 100] → picks the (offset+1)-th point in key order, never i=1
    val x = a.head.c.head
    assert(x >= 2.0 && x <= 101.0, s"pick $x outside the offset-limit window")
    // different seeds reach different offsets (97 and 9 differ for Random)
    assert(KMeans.seedFirstRandom(data, seed = 97) != a)
  }

  test("d1Weights reproduces the reference's plain-distance seeding (Q1 bug-compat)") {
    // chosen = (0,0); remaining at distance 10, 20, 5 (i-order: p2, p3, p4)
    //   D² weights: 100, 400, 25  → cum 100, 500, 525; u=1/2 → 262.5 → p3
    //   D¹ weights:  10,  20,  5  → cum  10,  30,  35; u=1/2 → 17.5  → p3
    //   but u=1/5:   D² → 105 → p3;  D¹ → 7 → p2   (modes diverge)
    val chosen = Seq(Centroid(1, Seq(0.0, 0.0)))
    val data = pts(
      1L -> Seq(0.0, 0.0), 2L -> Seq(10.0, 0.0), 3L -> Seq(0.0, 20.0), 4L -> Seq(5.0, 0.0))
    def draw(d1: Boolean, uNum: Long, uDen: Long): Long =
      KMeans.seedNextInverseCdf(data, chosen, uNum, uDen, d1Weights = d1)
        .select("i").as[Long].head()
    assert(draw(d1 = true, 1, 2) == 3L)
    assert(draw(d1 = false, 1, 5) == 3L)
    assert(draw(d1 = true, 1, 5) == 2L) // the as-built reference diverges here
  }

  test("dedupY replays the reference's group-by-Y seeding collapse (A10)") {
    // chosen = (0,0); p2 and p3 share the coordinate (10,0), p4 at (30,0).
    //   multiset D²: 100,100,900 → cum 100,200,1100; u=1/2 → 550 → p4
    //   dedup  D²: 100,    900 → cum 100,1000;      u=1/2 → 500 → p4? no:
    //     threshold cum*2 >= 1000 → first cum=100 fails, 1000 passes → p4
    //     ... so pick u where modes diverge: u=1/6:
    //   multiset: 1100/6=183.3 → first cum≥183.3 → p3 (cum 200, i=3)
    //   dedup:    1000/6=166.7 → first cum≥166.7 → p4 (cum 1000)
    val chosen = Seq(Centroid(1, Seq(0.0, 0.0)))
    val data = pts(
      1L -> Seq(0.0, 0.0), 2L -> Seq(10.0, 0.0), 3L -> Seq(10.0, 0.0),
      4L -> Seq(30.0, 0.0))
    def draw(dedup: Boolean): Long =
      KMeans.seedNextInverseCdf(data, chosen, 1, 6, dedupY = dedup)
        .select("i").as[Long].head()
    assert(draw(dedup = false) == 3L)
    assert(draw(dedup = true) == 4L)
  }

  test("lloydStepConst (broadcast-data plan) is bit-identical to lloydStepFast") {
    // pins the plan-shape switch fit() makes past 4096 embedded literals,
    // which no small-k spec reaches organically
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val cs = KMeans.seedFirstK(data, 7)
    val fast = KMeans.lloydStepFast(KMeans.assign(data, cs), dim = 64, fxScale = 1e6)
    val const = KMeans.lloydStepConst(data, cs, dim = 64, fxScale = 1e6)
    assert(fast.map(_.j) == const.map(_.j))
    fast.zip(const).foreach { case (a, b) =>
      a.c.zip(b.c).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
      }
    }
  }

  test("movementRefLimit2ByStep replays the reference's limit-2-by-step bug (Q2)") {
    import KMeans.LogEntry
    // 3 centroids over 2 steps; the per-step cut keeps j=1,2 only
    val log = Seq(
      LogEntry(0, 1, Seq(0.0, 0.0)), LogEntry(0, 2, Seq(4.0, 0.0)), LogEntry(0, 3, Seq(9.0, 0.0)),
      LogEntry(1, 1, Seq(3.0, 4.0)), LogEntry(1, 2, Seq(4.0, 1.0)), LogEntry(1, 3, Seq(0.0, 0.0)))
    // intended semantics counts all three: 5 + 1 + 9
    val prev = Seq(KMeans.Centroid(1, Seq(0.0, 0.0)), KMeans.Centroid(2, Seq(4.0, 0.0)),
      KMeans.Centroid(3, Seq(9.0, 0.0)))
    val next = Seq(KMeans.Centroid(1, Seq(3.0, 4.0)), KMeans.Centroid(2, Seq(4.0, 1.0)),
      KMeans.Centroid(3, Seq(0.0, 0.0)))
    assert(KMeans.movement(prev, next) == 15.0)
    // as-built: j=3 never survives the cut -> only 5 + 1
    assert(KMeans.movementRefLimit2ByStep(log) == 6.0)
    // a centroid seen at a single kept step compares against the zero tuple
    // (ClickHouse out-of-bounds default) and contributes its norm
    val single = Seq(LogEntry(0, 1, Seq(3.0, 4.0)))
    assert(KMeans.movementRefLimit2ByStep(single) == 5.0)
  }

  test("lloydStepOnePass (single-stage driver merge) is bit-identical to lloydStepFast") {
    // pins the fit loop's default step: the one-stage sufficient-stats
    // collect must produce the same longs (and so the same doubles) as the
    // declarative shuffle form, in any partitioning
    val data = Tables.yhEmbeddings(spark, sf("0.001")).repartition(5).cache()
    val cs = KMeans.seedFirstK(data, 7)
    val fast = KMeans.lloydStepFast(KMeans.assign(data, cs), dim = 64, fxScale = 1e6)
    val one = KMeans.lloydStepOnePass(data, cs, dim = 64, fxScale = 1e6)
    assert(fast.map(_.j) == one.map(_.j))
    fast.zip(one).foreach { case (a, b) =>
      a.c.zip(b.c).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
      }
    }
  }

  test("fitLocal is bit-identical to the distributed fit (both seeding paths)") {
    // the fitAuto size switch is only sound if the local twin reproduces the
    // distributed FitResult exactly — full log equality, bitwise doubles
    def logBits(r: KMeans.FitResult): Seq[(Long, Long, Seq[Long])] =
      r.log.map(e => (e.step, e.j, e.c.map(java.lang.Double.doubleToLongBits)))
    val emb = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val dist = KMeans.fit(emb, k = 6, dim = 64, parallelSeed = true, seed = 42)
    val local = KMeans.fitLocal(emb, k = 6, dim = 64, tol = 0.01,
      maxIter = 50, seed = 42, fxScale = 1e6, parallelSeed = true)
    assert(logBits(local) == logBits(dist))
    assert(local.steps == dist.steps && local.finalMovement == dist.finalMovement)

    val ord = Tables.yhOrders(spark, sf("0.001")).cache()
    val dist2 = KMeans.fit(ord, k = 4, dim = 2, seed = 7)
    val local2 = KMeans.fitLocal(ord, k = 4, dim = 2, tol = 0.01,
      maxIter = 50, seed = 7, fxScale = 1e6, parallelSeed = false)
    assert(logBits(local2) == logBits(dist2))

    // and fitAuto picks the local path below the threshold / distributed above
    val auto = KMeans.fitAuto(emb, k = 6, dim = 64, parallelSeed = true, seed = 42)
    assert(logBits(auto) == logBits(dist))
    val forced = KMeans.fitAuto(emb, k = 6, dim = 64, parallelSeed = true,
      seed = 42, localMaxCells = 1)
    assert(logBits(forced) == logBits(dist))
  }

  test("fitBounded: the driver-local fast path is bit-identical to the " +
      "distributed seed+Lloyd chain") {
    def logBits(r: KMeans.FitResult): Seq[(Long, Long, Seq[Long])] =
      r.log.map(e => (e.step, e.j, e.c.map(java.lang.Double.doubleToLongBits)))
    val emb = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    // localMaxCells = 0 forces the distributed chain on the same input
    val dist = KMeans.fitBounded(emb, k = 5, dim = 64, tol = 0.01,
      lloydSteps = 3, fxScale = 1e6, weightScale = 1e6, localMaxCells = 0)
    val local = KMeans.fitBounded(emb, k = 5, dim = 64, tol = 0.01,
      lloydSteps = 3, fxScale = 1e6, weightScale = 1e6)
    assert(logBits(local) == logBits(dist))
    assert(local.steps == dist.steps &&
      local.finalMovement == dist.finalMovement)
  }

  test("km_fit_free: the free-running fit CONVERGES before the safety cap " +
      "and extends the bounded prefix") {
    val yh = Tables.yhOrders(spark, sf("0.001")).cache()
    try {
      val free = KMeans.fitBounded(yh, k = 4, dim = 2, tol = 0.01,
        lloydSteps = 64, fxScale = 1e4)
      // the movement gate stopped the loop, not the cap — the recursive
      // oracle's WHERE pmv >= tol predicate is what decided on both engines
      assert(free.steps < 64, s"hit the safety cap at ${free.steps}")
      assert(free.finalMovement < 0.01)
      // the bounded fit is the same trajectory truncated: identical log
      // prefix bit-for-bit (same seeds, same per-step arithmetic)
      val bounded = KMeans.fitBounded(yh, k = 4, dim = 2, tol = 0.01,
        lloydSteps = 3, fxScale = 1e4)
      def bits(r: KMeans.FitResult) =
        r.log.map(e => (e.step, e.j, e.c.map(java.lang.Double.doubleToLongBits)))
      assert(bits(free).take(bits(bounded).length) == bits(bounded))
    } finally yh.unpersist()
  }

  test("fitHamerly (bounded acceleration) produces identical assignments and log") {
    def logBits(r: KMeans.FitResult): Seq[(Long, Long, Seq[Long])] =
      r.log.map(e => (e.step, e.j, e.c.map(java.lang.Double.doubleToLongBits)))
    // planted 4-cluster fixture (the reference's data generator shape)
    val seeds = Seq((0.0, 0.0), (60.0, 10.0), (10.0, 70.0), (70.0, 80.0))
    val data = seeds.zipWithIndex.map { case ((x, y), ix) => (ix.toLong, x, y) }
      .toDF("s", "sx", "sy")
      .crossJoin(spark.range(500).select(col("id")))
      .select((col("s") * 500 + col("id") + 1).as("i"),
        array(col("sx") + rand(42) * 15.0, col("sy") + rand(43) * 15.0).as("Y"))
      .cache()
    val plain = KMeans.fit(data, k = 4, dim = 2, plusPlus = true, seed = 7)
    val bounded = KMeans.fitHamerly(data, k = 4, dim = 2, plusPlus = true, seed = 7)
    assert(logBits(bounded) == logBits(plain))
    assert(KMeans.assign(data, bounded.centroids).groupBy("j").count().collect().toSet ==
      KMeans.assign(data, plain.centroids).groupBy("j").count().collect().toSet)

    // high-dim fixture, k-means|| seeding, a checkpoint inside the run
    val emb = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val p2 = KMeans.fit(emb, k = 6, dim = 64, parallelSeed = true, seed = 42)
    val b2 = KMeans.fitHamerly(emb, k = 6, dim = 64, parallelSeed = true, seed = 42,
      checkpointEvery = 3)
    assert(logBits(b2) == logBits(p2))
  }

  test("seedPlusPlusScalable draws identically to the literal-centroid formulation") {
    // regression pin: the broadcast-join form must keep drawing the same
    // rand(seed) values as a plain literal projection — a planner/AQE change
    // that reorders the stream side would silently alter every ++ fit
    import graft.functions.VectorOps
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val chosen = KMeans.seedFirstK(data, 3)
    val got = KMeans.seedPlusPlusScalable(data, chosen, seed = 11)
    val w = VectorOps.nearestSqDist(col("Y"), chosen.map(_.c))
    val key = when(w > 0, pow(rand(11), lit(1.0) / w)).otherwise(lit(-1.0))
    val want = data.select(col("i"), col("Y"), key.as("skey"))
      .agg(max_by(struct(col("i"), col("Y")), col("skey")))
      .head().getStruct(0).getSeq[Double](1)
    assert(got.j == 4L)
    assert(got.c == want)
  }

  test("seedParallel (k-means||) is deterministic and partitioning-independent") {
    val yh = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val a = KMeans.seedParallel(yh, k = 6, seed = 7)
    val b = KMeans.seedParallel(yh, k = 6, seed = 7)
    assert(a == b, "same seed must reproduce the same centroids")
    assert(a.size == 6 && a.map(_.j) == (1L to 6L))
    // xxhash64 coins are a pure function of the data: a different partition
    // layout draws the same candidates (rand() would not survive this)
    val c = KMeans.seedParallel(yh.repartition(7, col("i")), k = 6, seed = 7)
    assert(a == c, "partition layout must not change the seeding")
  }

  test("fit with k-means|| seeding matches ++ quality on the planted fixture") {
    val rnd = new scala.util.Random(5)
    val centersTrue = Seq(Seq(0.0, 0.0), Seq(50.0, 0.0), Seq(0.0, 50.0), Seq(50.0, 50.0))
    val data = pts((1L to 400L).map { i =>
      val c = centersTrue((i % 4).toInt)
      i -> Seq(c(0) + rnd.nextGaussian(), c(1) + rnd.nextGaussian())
    }: _*)
    val fit = KMeans.fit(data, k = 4, dim = 2, parallelSeed = true, seed = 11)
    assert(fit.centroids.size == 4)
    // every true center has a fitted centroid within 1.0
    centersTrue.foreach { t =>
      val d = fit.centroids.map(c =>
        math.sqrt(c.c.zip(t).map { case (a, b) => (a - b) * (a - b) }.sum)).min
      assert(d < 1.0, s"true center $t unmatched (nearest $d)")
    }
  }

  test("fit recovers the reference's planted 4-cluster fixture") {
    // Reference test-data generator (k-means.sql:1-4): 4 seed points, each
    // cloned 500x with bounded jitter — rebuilt with seeded rand.
    val seeds = Seq((0.0, 0.0), (60.0, 10.0), (10.0, 70.0), (70.0, 80.0))
    val seedDf = seeds.zipWithIndex.map { case ((x, y), ix) => (ix.toLong, x, y) }
      .toDF("s", "sx", "sy")
    val data = seedDf
      .crossJoin(spark.range(500).select(col("id")))
      .select(
        (col("s") * 500 + col("id") + 1).as("i"),
        array(
          col("sx") + rand(42) * 15.0,
          col("sy") + rand(43) * 15.0).as("Y"))
      .cache()
    val fit = KMeans.fit(data, k = 4, dim = 2, plusPlus = true, seed = 7)
    assert(fit.centroids.size == 4, s"expected 4 surviving clusters, got ${fit.centroids}")
    assert(fit.finalMovement < 0.01)
    // each recovered centroid lies near one distinct plant site (+7.5 jitter mean)
    val expected = seeds.map { case (x, y) => (x + 7.5, y + 7.5) }
    val matched = expected.map { case (ex, ey) =>
      fit.centroids.minBy(c => math.pow(c.c(0) - ex, 2) + math.pow(c.c(1) - ey, 2))
    }
    assert(matched.toSet.size == 4, "centroids must match plant sites 1:1")
    matched.zip(expected).foreach { case (c, (ex, ey)) =>
      val d = math.sqrt(math.pow(c.c(0) - ex, 2) + math.pow(c.c(1) - ey, 2))
      assert(d < 3.0, s"centroid ${c.c} too far from plant ($ex,$ey): $d")
    }
    // cluster sizes ~500 each
    val sizes = KMeans.assign(data, fit.centroids).groupBy("j").count()
      .select("count").as[Long].collect()
    assert(sizes.forall(s => s > 400 && s < 600), s"sizes: ${sizes.toSeq}")
  }

  test("lloydStepFast (single vector_sum_long aggregate) is bit-identical to lloydStep") {
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val assigned = KMeans.assign(data, KMeans.seedFirstK(data, 7))
    val slow = KMeans.lloydStep(assigned, dim = 64, fxScale = 1e6)
    val fast = KMeans.lloydStepFast(assigned, dim = 64, fxScale = 1e6)
    assert(slow.map(_.j) == fast.map(_.j))
    slow.zip(fast).foreach { case (a, b) =>
      a.c.zip(b.c).foreach { case (x, y) =>
        assert(java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y))
      }
    }
  }

  test("property: WCSS is non-increasing across Lloyd iterations") {
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    var cs = KMeans.seedFirstK(data, 5)
    var last = Double.MaxValue
    for (_ <- 1 to 4) {
      val assigned = KMeans.assign(data, cs)
      cs = KMeans.lloydStep(assigned, dim = 64)
      val wcss = operators.Quality.elbow(data, cs).select("elbow_d2").as[Double].head()
      assert(wcss <= last + 1e-6, s"WCSS increased: $last -> $wcss")
      last = wcss
    }
  }

  test("fitMiniBatch: cost within 15% of full Lloyd at a fraction of the scans") {
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val full = KMeans.fit(data, k = 8, dim = 64, seed = 42)
    val mb = KMeans.fitMiniBatch(data, k = 8, dim = 64,
      batchFrac = 0.2, maxIter = 20, seed = 42)
    assert(mb.centroids.size == 8)
    def cost(cs: Seq[KMeans.Centroid]): Double =
      operators.Quality.elbow(data, cs).select("elbow_d2").as[Double].head()
    val (cFull, cMb) = (cost(full.centroids), cost(mb.centroids))
    assert(cMb <= cFull * 1.15,
      s"mini-batch WCSS $cMb vs full $cFull — more than 15% worse")
    // deterministic: same seed, same result
    val again = KMeans.fitMiniBatch(data, k = 8, dim = 64,
      batchFrac = 0.2, maxIter = 20, seed = 42)
    assert(again.centroids == mb.centroids && again.steps == mb.steps)
    // the log carries every step (seeds at 0 plus k rows per step)
    assert(mb.log.size == ((mb.steps + 1) * 8).toInt)
    // r19: the driver-local twin (default gate) must be BIT-IDENTICAL to
    // the distributed loop (localMaxCells=0 forces it) — centroids, step
    // count, movement, and the full WCR log
    val dist = KMeans.fitMiniBatch(data, k = 8, dim = 64,
      batchFrac = 0.2, maxIter = 20, seed = 42, localMaxCells = 0L)
    assert(dist.centroids == mb.centroids && dist.steps == mb.steps &&
      dist.finalMovement == mb.finalMovement && dist.log == mb.log)
  }

  test("fit quality matches MLlib KMeans (WCSS cross-check)") {
    // NOTE: the embeddings' `label` column is NOT L2-recoverable (nearest-
    // true-label-centroid accuracy is only ~37% on this synthetic data), so
    // the meaningful oracle is cost parity with MLlib's native KMeans, not
    // label purity.
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val ours = KMeans.fit(data, k = 10, dim = 64, plusPlus = true, seed = 42)
    val ourCost = operators.Quality.elbow(data, ours.centroids)
      .select("elbow_d2").as[Double].head()
    val ml = operators.KMeansML.fit(data, k = 10, seed = 42)
    assert(ours.centroids.size == 10)
    assert(ourCost <= ml.cost * 1.05,
      s"our WCSS $ourCost vs MLlib ${ml.cost} — more than 5% worse")
  }

  test("pinned-census quality gate: the three self-pinned fits clear " +
      "independent WCSS bounds on the pin fixture (sf0.01)") {
    // r16 verdict task 5: OracleSql.pinnedCensus verifies DETERMINISM of
    // km_fit / km_fit_mllib / km_fit_bisecting, not quality — a regression
    // that shifts all three censuses together could pass by re-pinning.
    // This gate is the independent supplement: the same fits, the same
    // fixture the censuses were captured from, judged on WCSS (the
    // km_fit_mllib-lineage cross-check) against (a) each other and (b) a
    // pinned absolute ceiling ~10% above the captured cost. A re-pin after
    // a quality regression fails HERE. QUERIES.md carries the permanent
    // footnote: 289 independent oracles + 3 determinism pins + this gate.
    val data = Tables.yhEmbeddings(spark, sf("0.01")).cache()
    def wcss(cs: Seq[KMeans.Centroid]): Double =
      operators.Quality.elbow(data, cs).select("elbow_d2").as[Double].head()
    // km_fit's exact fit (SparkEntry.embFit): k-means|| seeded fitAuto
    val ours = wcss(KMeans.fitAuto(data, k = 10, dim = 64,
      parallelSeed = true, seed = 42).centroids)
    val ml = operators.KMeansML.fit(data, k = 10)
    val bi = operators.KMeansML.fitBisecting(data, k = 10)
    info(s"sf0.01 WCSS: ours=$ours mllib=${ml.cost} bisecting=${bi.cost}")
    // relative gates: the two flat fits within 5% of each other, divisive
    // splits within 2x (the documented stability-for-cost trade)
    assert(ours <= ml.cost * 1.05,
      s"km_fit WCSS $ours vs MLlib ${ml.cost} — more than 5% worse")
    assert(bi.cost <= ml.cost * 2.0,
      s"bisecting cost ${bi.cost} vs flat ${ml.cost} — more than 2x worse")
    // absolute ceilings pinned ~10% above the captured round-17 costs —
    // the re-pin tripwire (update ONLY with a recorded quality adjudication)
    assert(ours < PinnedFitWcssCeiling,
      s"km_fit WCSS $ours broke the pinned ceiling $PinnedFitWcssCeiling")
    assert(ml.cost < PinnedFitWcssCeiling,
      s"km_fit_mllib cost ${ml.cost} broke the pinned ceiling")
    assert(bi.cost < PinnedFitWcssCeiling * 2.0,
      s"km_fit_bisecting cost ${bi.cost} broke 2x the pinned ceiling")
    data.unpersist()
  }

  test("bisecting fit: k leaves, full coverage, cost within 2x of flat MLlib") {
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val bi = operators.KMeansML.fitBisecting(data, k = 10, seed = 42)
    val assigned = operators.KMeansML.transformBisecting(bi, data)
    val sizes = assigned.groupBy("j").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == (1L to 10L).toSet)
    assert(sizes.values.sum == 500L)
    // divisive splits trade some WCSS for stability — bound the gap
    val flat = operators.KMeansML.fit(data, k = 10, seed = 42)
    assert(bi.cost <= flat.cost * 2.0,
      s"bisecting cost ${bi.cost} vs flat ${flat.cost} — more than 2x worse")
  }

  test("assignment is idempotent at the fixpoint") {
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val fit = KMeans.fit(data, k = 5, dim = 64, tol = 1e-9, maxIter = 100)
    val again = KMeans.lloydStep(KMeans.assign(data, fit.centroids), dim = 64)
    val move = KMeans.movement(fit.centroids, again)
    assert(move < 1e-3, s"converged fit moved $move on an extra step")
  }

  test("model save/load roundtrip is bit-exact and serves identical assignments") {
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val fit = KMeans.fit(data, k = 4, dim = 64, seed = 42)
    val path = java.nio.file.Files.createTempDirectory("graft_model").toString
    KMeans.saveModel(spark, fit, path)
    val loaded = KMeans.loadModel(spark, path)
    // bit-exact coordinates, j order preserved
    assert(loaded.map(c => (c.j, c.c.map(java.lang.Double.doubleToLongBits))) ==
      fit.centroids.sortBy(_.j).map(c => (c.j, c.c.map(java.lang.Double.doubleToLongBits))))
    // and the served assignments equal training-time assignments
    val a = KMeans.assign(data, fit.centroids).select("i", "j")
      .as[(Long, Long)].collect().toMap
    val b = KMeans.assign(data, loaded).select("i", "j")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // the saved log has the WCR shape
    val log = spark.read.parquet(s"$path/log")
    assert(log.columns.toSeq == Seq("step", "j", "C"))
    assert(log.count() == fit.log.size)
  }

  test("fitFrom resumes through a save/load cycle, identical to the straight run") {
    // the restart path of a multi-hour fit: run 2 steps, persist, reload,
    // continue 2 more — centroids, step numbering, and the concatenated WCR
    // log must all equal the uninterrupted 4-step fit's
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val full = KMeans.fit(data, k = 4, dim = 64, tol = 0.0, maxIter = 4, seed = 42)
    val half = KMeans.fit(data, k = 4, dim = 64, tol = 0.0, maxIter = 2, seed = 42)
    val path = java.nio.file.Files.createTempDirectory("graft_resume").toString
    KMeans.saveModel(spark, half, path)
    val resumed = KMeans.fitFrom(data, KMeans.loadModel(spark, path), dim = 64,
      tol = 0.0, maxIter = 2, startStep = half.steps)
    assert(resumed.centroids == full.centroids,
      "resumed centroids diverge from the uninterrupted fit")
    assert(resumed.steps == full.steps)
    assert((half.log ++ resumed.log) == full.log,
      "half log + resumed log must concatenate into the full WCR history")
  }

  test("concurrent fits restore the session conf (withIterConf reentrancy)") {
    // gapStatistic runs its per-k fits in parallel on ONE session; an
    // interleaved save/restore could capture another fit's in-flight iter
    // conf and leave the session permanently at aqe=off/1-partition,
    // degrading every later query in the process. The guard is
    // reference-counted: stress it with staggered concurrent fits and
    // assert the caller's conf survives.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    data.count()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fits = (0 until 8).map { i =>
      Future {
        Thread.sleep(i * 20L) // stagger entries/exits across fit lifetimes
        KMeans.fit(data, k = 3, dim = 64, maxIter = 2 + i % 3, seed = 42 + i)
      }
    }
    val results = Await.result(Future.sequence(fits), 5.minutes)
    assert(results.forall(_.centroids.nonEmpty))
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore,
      "AQE setting not restored after concurrent fits")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == partsBefore,
      "shuffle.partitions not restored after concurrent fits")
  }
}
