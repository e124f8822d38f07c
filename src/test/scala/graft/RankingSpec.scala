package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranking

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank matches row_number over a total order, no single-partition window") {
    val df = Tables.read(spark, sf("0.001"), "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val got = Ranking.globalRank(df,
        Seq(col("o_totalprice").desc, col("o_orderkey")), parts = 5)
      .select(col("o_orderkey"), col("rnk"))
      .as[(Long, Long)].collect().toMap
    val want = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey")))
          .cast("long"))
      .select(col("o_orderkey"), col("rnk")).as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("ranks are invariant to input partitioning and split count") {
    val base = Tables.read(spark, sf("0.001"), "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val order = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val a = Ranking.globalRank(base.repartition(3), order, parts = 4)
      .select("o_orderkey", "rnk").as[(Long, Long)].collect().toMap
    val b = Ranking.globalRank(base.repartition(13), order, parts = 9)
      .select("o_orderkey", "rnk").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("globalNtile matches the window ntile exactly, incl. uneven and n<k cuts") {
    val base = Tables.read(spark, sf("0.001"), "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val order = Seq(col("o_totalprice").desc, col("o_orderkey"))
    // k values that exercise: even split, uneven remainder, k ~ n, k > n
    val n = base.count()
    for (k <- Seq(2, 3, 7, 10, n.toInt - 1, n.toInt + 5)) {
      val got = Ranking.globalNtile(base, order, k)
        .select(col("o_orderkey"), col("bucket"))
        .as[(Long, Long)].collect().toMap
      val want = base.withColumn("bucket",
          ntile(k).over(Window.orderBy(col("o_totalprice").desc,
            col("o_orderkey"))).cast("long"))
        .select(col("o_orderkey"), col("bucket"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"k=$k")
    }
  }

  test("zonemapSkip: z-order prunes the 2-D box both single-order layouts can't") {
    import graft.operators.Profiling
    // 32×32 grid, one row per (pk, sk) cell; row-major insert order
    val rows = (0L until 1024L).map(i => (i, i / 32L, i % 32L))
      .toDF("rid", "pk", "sk")
      .withColumn("z", graft.sources.Sinks.zValue(col("pk"), col("sk"), 5))
    val got = Profiling.zonemapSkip(rows,
        Seq(
          ("linear", Seq(col("rid"))),
          ("pk_sorted", Seq(col("pk"), col("rid"))),
          ("zorder", Seq(col("z"), col("rid")))),
        nFiles = 16,
        preds = Seq(("box", 0L, 7L, 0L, 7L), ("stripe_sk", 0L, 31L, 0L, 1L)))
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._4, r._5))).toMap
    // 16 files of 64 rows. Insert order IS pk-major here, so linear ==
    // pk_sorted: each file covers 2 pk rows with sk spanning full width, so
    // the box needs the 4 files covering pk 0..7; the sk-stripe overlaps
    // every file. Z-order: each file is one 8×8 block -> the box is exactly
    // 1 file; the sk 0..1 stripe intersects the 4 blocks with sk-range 0..7.
    assert(got(("linear", "box")) == ((4L, 256L)), got.toString)
    assert(got(("pk_sorted", "box")) == ((4L, 256L)), got.toString)
    assert(got(("zorder", "box")) == ((1L, 64L)), got.toString)
    assert(got(("linear", "stripe_sk")) == ((16L, 1024L)), got.toString)
    assert(got(("zorder", "stripe_sk")) == ((4L, 256L)), got.toString)
  }
}
