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
}
