package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The graft-numbers DataSource V2 connector: values, split planning,
  * filter pushdown (row-exact range tightening), column pruning, and
  * stats-driven auto-broadcast.
  */
class SourcesV2Spec extends SparkSpec {
  import spark.implicits._

  private def numbers(end: Long, start: Long = 0L, splits: Int = 8): DataFrame =
    spark.read.format("graft-numbers")
      .option("start", start).option("end", end).option("splits", splits)
      .load()

  test("values and hex column over the full range") {
    val got = numbers(16L).orderBy("i").as[(Long, String)].collect()
    assert(got.map(_._1).toSeq == (0L until 16L))
    assert(got.map(_._2).toSeq == (0 until 16).map(java.lang.Long.toHexString(_)))
  }

  test("split planning: contiguous near-equal ranges, never more than rows") {
    assert(numbers(1000L, splits = 8).rdd.getNumPartitions == 8)
    // 3 rows can't fill 8 splits
    assert(numbers(3L, splits = 8).rdd.getNumPartitions == 3)
    // empty range plans zero partitions and yields zero rows
    val empty = numbers(5L, start = 5L)
    assert(empty.rdd.getNumPartitions == 0 && empty.count() == 0)
  }

  test("range filter pushdown prunes splits and shows in the scan description") {
    val df = numbers(100000L, splits = 32)
      .filter(col("i") >= 20000L && col("i") < 30000L)
    // the residual range is [20000, 30000): 10% of rows -> far fewer splits
    assert(df.rdd.getNumPartitions == 32) // splits still 32 over the narrowed range
    assert(df.count() == 10000L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[20000, 30000)"), s"plan was:\n$plan")
    // fully-handled range filters are consumed: no post-scan Filter node
    assert(!plan.contains("Filter ("), s"plan was:\n$plan")
  }

  test("equality pushdown narrows to a single row") {
    val df = numbers(1000000L, splits = 32).filter(col("i") === 42L)
    assert(df.rdd.getNumPartitions == 1)
    assert(df.select("hex").as[String].collect().toSeq == Seq("2a"))
  }

  test("column pruning drops hex from the scan when only i is read") {
    val df = numbers(64L).select("i")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=i") && !plan.contains("cols=i,hex"),
      s"plan was:\n$plan")
    assert(df.agg(sum("i")).as[Long].head() == 63L * 64L / 2L)
    // count(*) prunes everything and still counts right
    assert(numbers(777L).count() == 777L)
  }

  test("reported statistics drive auto-broadcast of a small numbers table") {
    val big = spark.range(0, 200000L).toDF("k")
    val joined = big.join(numbers(100L), big("k") === col("i"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan was:\n$plan")
    assert(joined.count() == 100L)
  }

  test("global COUNT/SUM/MIN/MAX push down completely: one partition, closed form") {
    val df = numbers(1000000L, splits = 32)
      .filter(col("i") >= 10L)
      .agg(count(lit(1)).as("n"), sum("i").as("s"),
        min("i").as("mn"), max("i").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AGG-PUSHDOWN"), s"plan was:\n$plan")
    val (n, s, mn, mx) = df.as[(Long, Long, Long, Long)].head()
    assert(n == 999990L)
    assert(mn == 10L && mx == 999999L)
    assert(s == (10L + 999999L) * 999990L / 2L)
  }

  test("aggregate pushdown over an empty range yields count 0 and null extremes") {
    val df = numbers(5L, start = 5L)
      .agg(count(lit(1)).as("n"), sum("i").as("s"), min("i").as("mn"))
    val row = df.as[(Long, Option[Long], Option[Long])].head()
    assert(row == ((0L, None, None)))
  }

  test("grouped aggregation is declined and still answers correctly") {
    val df = numbers(100L).groupBy((col("i") % 3L).as("b")).agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("AGG-PUSHDOWN"), s"plan was:\n$plan")
    assert(df.as[(Long, Long)].collect().toMap ==
      Map(0L -> 34L, 1L -> 33L, 2L -> 33L))
  }

  test("a modulo predicate stays as a residual post-scan filter") {
    val df = numbers(1000L).filter(col("i") % 7 === 0)
    assert(df.count() == 143L) // 0, 7, ..., 994
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), s"plan was:\n$plan")
  }
}
