package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, Quality}
import graft.operators.KMeans.Centroid

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("elbow: d1 = sum of nearest distances, d2 = WCSS, computed exactly") {
    val data = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(3.0, 4.0)),   // nearest c1: d=0, 5
      (3L, Seq(100.0, 100.0))                      // nearest c2: d=0
    ).toDF("i", "Y")
    val cs = Seq(Centroid(1, Seq(0.0, 0.0)), Centroid(2, Seq(100.0, 100.0)))
    val r = Quality.elbow(data, cs, d1Scale = 1e6, d2Scale = 1e6)
      .as[(Double, Double)].head()
    assert(r._1 == 5.0)   // 0 + 5 + 0
    assert(r._2 == 25.0)  // 0 + 25 + 0
  }

  test("silhouette: two tight far-apart clusters -> si near 1") {
    val data = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)), (3L, Seq(0.0, 1.0)),
      (4L, Seq(100.0, 100.0)), (5L, Seq(101.0, 100.0)), (6L, Seq(100.0, 101.0))
    ).toDF("i", "Y")
    val cs = Seq(Centroid(1, Seq(0.3, 0.3)), Centroid(2, Seq(100.3, 100.3)))
    val r = Quality.silhouetteSimplified(KMeans.assign(data, cs))
      .select("si").as[Double].head()
    assert(r > 0.95, s"si=$r")
  }

  test("native pair-stats kernel is bit-identical to the relational pair join") {
    val yh = Tables.yhOrders(spark, sf("0.001"))
    val sample = yh.filter(col("i") % 29 === 0)
    val assigned = KMeans.assign(sample, KMeans.seedFirstK(yh, 4)).cache()
    val native = Quality.silhouettePairStats(assigned)
      .orderBy("i1", "j2").as[(Long, Long, Long, Long, Long)].collect().toSeq
    val join = Quality.silhouettePairStatsJoin(assigned)
      .orderBy("i1", "j2").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assigned.unpersist()
    assert(native.nonEmpty && native == join)
  }

  test("optimalKNested: monotone elbows, per-row parity with single-k operators") {
    val yh = Tables.yhOrders(spark, sf("0.001")).cache()
    val sample = yh.filter(col("i") % 29 === 0)
    val seeds = KMeans.seedFirstK(yh, 6)
    val ks = 2 to 6
    val rows = Quality.optimalKNested(yh, sample, seeds, ks,
        d1Scale = 1e4, d2Scale = 0.01)
      .orderBy("k").as[(Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == ks.map(_.toLong))
    // nested prefixes: min over a centroid superset can't grow
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"elbow_d1 not monotone: $a -> $b")
      assert(b._3 <= a._3, s"elbow_d2 not monotone: $a -> $b")
    }
    // bit-identical to running the single-k operators separately
    ks.zip(rows).foreach { case (k, row) =>
      val ck = seeds.take(k)
      val e = Quality.elbow(yh, ck, d1Scale = 1e4, d2Scale = 0.01)
        .as[(Double, Double)].head()
      val si = Quality.silhouetteSimplified(KMeans.assign(sample, ck))
        .select("si").as[Double].head()
      assert(row._2 == e._1 && row._3 == e._2, s"k=$k elbow mismatch: $row vs $e")
      assert(row._4 == si, s"k=$k si mismatch: ${row._4} vs $si")
    }
  }

  test("optimalKSweep (fit-per-k): one row per k, WCSS decreasing") {
    val yh = Tables.yhOrders(spark, sf("0.001")).cache()
    val sample = yh.filter(col("i") % 29 === 0)
    val rows = Quality.optimalKSweep(yh, sample, dim = 2, ks = Seq(2, 4),
        d1Scale = 1e4, d2Scale = 0.01, maxIter = 5)
      .orderBy("k").as[(Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(2L, 4L))
    assert(rows(1)._3 <= rows(0)._3, s"fit WCSS should not grow with k: $rows")
  }

  test("validity indices match hand-computed values on a planted fixture") {
    // two clusters {(0,0),(0,2)} and {(10,0),(10,2)} with centers (0,1),(10,1):
    //   scatter s = 1 each, centroid distance 10 -> DB = (1+1)/10 = 0.2
    //   W = 4*1; global mean (5,1); B = 2*25 + 2*25 = 100
    //   CH = (100/(2-1)) / (4/(4-2)) = 50
    val pts = Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 2.0)),
      (3L, Seq(10.0, 0.0)), (4L, Seq(10.0, 2.0))).toDF("i", "Y")
    val cs = Seq(KMeans.Centroid(1, Seq(0.0, 1.0)), KMeans.Centroid(2, Seq(10.0, 1.0)))
    val r = Quality.validityIndices(pts, cs).as[(Double, Double)].head()
    assert(math.abs(r._1 - 0.2) < 1e-9, s"db=${r._1}")
    assert(math.abs(r._2 - 50.0) < 1e-9, s"ch=${r._2}")
  }

  test("gap statistic picks the planted k on the 4-cluster fixture") {
    val seeds4 = Seq((0.0, 0.0), (60.0, 10.0), (10.0, 70.0), (70.0, 80.0))
    val data = seeds4.zipWithIndex.map { case ((x, y), ix) => (ix.toLong, x, y) }
      .toDF("s", "sx", "sy")
      .crossJoin(spark.range(200).select(col("id")))
      .select((col("s") * 200 + col("id") + 1).as("i"),
        array(col("sx") + rand(42) * 12.0, col("sy") + rand(43) * 12.0).as("Y"))
      .cache()
    val got = Quality.gapStatistic(data, dim = 2, ks = 2 to 6)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (2L to 6L), "one row per k, in order")
    assert(got.count(_._4 == 1L) == 1, "exactly one chosen k")
    assert(got.find(_._4 == 1L).get._1 == 4L,
      s"must recover the planted k=4, got ${got.toSeq}")
    // determinism under repartitioning (hash-uniform reference, not rand())
    val again = Quality.gapStatistic(data.repartition(7), dim = 2, ks = 2 to 6)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("nested gap statistic: shape, one chosen k, partition-determinism") {
    val yh = Tables.yhOrders(spark, sf("0.001")).filter(col("i") % 7 === 0).cache()
    val seeds = KMeans.seedFirstK(yh, 6)
    val got = Quality.gapStatisticNested(yh, dim = 2, ks = 2 to 6, seeds = seeds)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == (2L to 6L), "one row per k, in order")
    assert(got.count(_._4 == 1L) == 1, "exactly one chosen k")
    assert(got.forall(_._3 >= 0L), "s_k is a scaled sd — non-negative")
    // the LCG reference draw is a pure function of the row id: identical
    // output under any partitioning (rand()-based draws are not)
    val again = Quality.gapStatisticNested(yh.repartition(7), dim = 2,
      ks = 2 to 6, seeds = seeds).as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("nested gap statistic survives box-diagonal msq at volume (no Long overflow)") {
    // every row sits the full box diagonal from the low-id seeds, the worst
    // case for the fixed-point dispersion sum: 20k rows × msq ≈ 3.6e11 —
    // a 1e4 scale would need ~7e19 and die under ANSI mode (the sf0.1
    // regression this pins); the 0.01 d2-convention scale must survive
    val pts = spark.range(20000).select(
      (col("id") + 1).as("i"),
      when(col("id") < 3, array(lit(0.0), lit(0.0)))
        .otherwise(array(lit(600000.0), lit(1000.0))).as("Y"))
    val seeds = KMeans.seedFirstK(pts, 2)
    val rows = Quality.gapStatisticNested(pts, dim = 2, ks = Seq(2),
      seeds = seeds).collect()
    assert(rows.length == 1 && rows.head.getLong(3) == 1L)
  }

  test("elbow decreases as k grows (on real embeddings)") {
    val data = Tables.yhEmbeddings(spark, sf("0.001")).cache()
    val wcss = Seq(2, 5, 10).map { k =>
      val fit = KMeans.fit(data, k = k, dim = 64, maxIter = 10)
      Quality.elbow(data, fit.centroids).select("elbow_d2").as[Double].head()
    }
    assert(wcss(0) > wcss(1) && wcss(1) > wcss(2), s"wcss=$wcss")
  }

  test("km_gap_fitted: golden-value pin on the sf0.001 fixture") {
    // direct by-name pin of the driver query (now ALSO hash-oracle-backed —
    // round 14): the oracle-replayable fitted gap is a pure function of the
    // data (transparent-LCG references with per-(set,dim) multipliers,
    // rational ++ draws, movement-gated fixed-point Lloyd), so the whole
    // table is stable to the exact integer
    val got = SparkEntry.queries("km_gap_fitted")(spark, sf("0.001"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (2L, 36179L, 5959L, 1L),
      (3L, 15651L, 29962L, 0L),
      (4L, 181309L, 98161L, 0L),
      (5L, 342355L, 12083L, 0L),
      (6L, 227276L, 170690L, 0L)), s"got $got")
  }

  test("gapStatisticFitted: driver-local fast path is bit-identical to the distributed chain") {
    // the fitAuto discipline pin: localMaxRows = 0 forces every stage
    // (++ draws, movement-gated Lloyd, dispersion census) through the
    // distributed plan; the default runs the same arithmetic driver-local.
    // Exact integer equality of the full output is the contract.
    val yh = Tables.yhOrders(spark, sf("0.001")).filter(col("i") % 7 === 0).cache()
    val local = Quality.gapStatisticFitted(yh, dim = 2, ks = 2 to 6)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val dist = Quality.gapStatisticFitted(yh, dim = 2, ks = 2 to 6,
      localMaxRows = 0L).as[(Long, Long, Long, Long)].collect().toSeq
    assert(local == dist, s"local=$local dist=$dist")
  }

  test("gapStatisticFitted reference sets are decorrelated (s_k does not collapse)") {
    // the round-14 LCG fix: with a SINGLE shared multiplier the three
    // reference sets are translations of one underlying sequence, their
    // fitted dispersions agree to wraparound noise and s_k rounds to ~0 —
    // vacating the Tibshirani criterion. Per-(set,dim) multipliers must
    // keep the spread real on real data.
    val yh = Tables.yhOrders(spark, sf("0.001")).filter(col("i") % 7 === 0).cache()
    val got = Quality.gapStatisticFitted(yh, dim = 2, ks = 2 to 6)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.count(_._3 > 1000L) >= 4,
      s"reference spread collapsed — translated (correlated) ref sets? $got")
  }
}
