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
}
