package graft

import org.apache.spark.sql.functions._
import graft.operators.TopK

/** The native two-phase top-k-per-group plan against the row_number window
  * form: value parity, plan shape (map-side pruning below the exchange),
  * and the shuffle-volume win the operator exists for.
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("v"), col("id"))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  test("matches the window form row-for-row on a hand fixture (ties, short groups)") {
    val df = Seq(
      (1L, 10L, 5.0), (2L, 10L, 5.0), (3L, 10L, 7.0), (4L, 10L, 1.0),
      (5L, 20L, 2.0),                       // short group: fewer than k rows
      (6L, 30L, 9.0), (7L, 30L, 9.0), (8L, 30L, 9.0) // all-tie group
    ).toDF("id", "g", "v")
    val native = TopK.perGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 2)
      .select("id", "g", "v", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    val window = windowTopK(df, 2)
      .select("id", "g", "v", "rnk")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(native == window)
    assert(native == Set(
      (3L, 10L, 7.0, 1L), (1L, 10L, 5.0, 2L),
      (5L, 20L, 2.0, 1L),
      (6L, 30L, 9.0, 1L), (7L, 30L, 9.0, 2L)))
  }

  test("matches the window form on the real lineitem relation across partitionings") {
    val li = Tables.read(spark, sf("0.001"), "lineitem")
      .select(col("l_orderkey").as("id"), col("l_suppkey").as("g"),
        col("l_extendedprice").as("v"))
      .withColumn("id", monotonically_increasing_id())
    for (reshaped <- Seq(li, li.repartition(7, col("v")))) {
      val native = TopK.perGroup(reshaped, Seq("g"),
          Seq("v" -> true, "id" -> false), 3)
        .select("g", "id", "rnk").as[(Long, Long, Long)].collect().toSet
      val window = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(desc("v"), col("id"))
        reshaped.withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select("g", "id", "rnk").as[(Long, Long, Long)].collect().toSet
      }
      assert(native == window)
    }
  }

  test("plan: partial pruning below the exchange, no Window, rank minted long") {
    val df = (1L to 1000L).map(i => (i, i % 10, i.toDouble)).toDF("id", "g", "v")
      .repartition(4, col("id"))
    val topk = TopK.perGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 5)
    val s = topk.queryExecution.executedPlan.toString
    assert(s.contains("FinalTopKPerGroup") && s.contains("PartialTopKPerGroup"),
      s"plan was:\n$s")
    assert(!s.contains("Window"), s"plan was:\n$s")
    // partial phase sits BELOW the exchange that feeds the final phase
    val finalIx = s.indexOf("FinalTopKPerGroup")
    val exchangeIx = s.indexOf("Exchange", finalIx)
    val partialIx = s.indexOf("PartialTopKPerGroup", finalIx)
    assert(exchangeIx >= 0 && partialIx > exchangeIx,
      s"partial must feed the exchange:\n$s")
    assert(topk.schema("rnk").dataType ==
      org.apache.spark.sql.types.LongType)
  }

  test("shuffle volume: at most k rows per (group, input partition) cross the wire") {
    // 4 input partitions x 10 groups x k=5 -> the exchange reads <= 200
    // rows regardless of the 10k input rows; measure via the partial
    // phase's output (collect the pruned relation through a marker plan)
    val df = (1L to 10000L).map(i => (i, i % 10, i.toDouble)).toDF("id", "g", "v")
      .repartition(4, col("id"))
    val topk = TopK.perGroup(df, Seq("g"), Seq("v" -> true, "id" -> false), 5)
    val qe = topk.queryExecution
    // drive THIS QueryExecution (a .write would plan a fresh one whose
    // metrics we couldn't read), then unwrap the AQE tree
    qe.executedPlan.execute().foreach(_ => ())
    val finalPlan = qe.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE query stages are LEAF nodes — recurse into their wrapped plans
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val through = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p.children :+ q.plan
        case _ => p.children
      }
      p +: through.flatMap(allNodes)
    }
    // two exchanges exist: the test's own repartition (full 10k rows) and
    // the operator's ENSURE_REQUIREMENTS exchange over the PRUNED relation
    val shuffles = allNodes(finalPlan).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.shuffleOrigin ==
            org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => e
    }
    assert(shuffles.nonEmpty, s"no exchange found in:\n$finalPlan")
    val written = shuffles.map(_.metrics("dataSize").value).max
    // 200 pruned rows of 3 longs + overhead land far under 64 KiB; the
    // unpruned 10k-row relation would be several hundred KiB
    assert(written > 0 && written < 64 * 1024,
      s"exchange carried $written bytes — pruning didn't happen?")
  }

  test("serves the brute-force ANN ranking with the existing oracle semantics") {
    val emb = Tables.read(spark, sf("0.001"), "embeddings")
    val native = graft.operators.Similarity.bruteForceTopKNative(emb)
      .as[(Long, Long, Long, Long)].collect().toSet
    val window = graft.operators.Similarity.bruteForceTopK(emb)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(native == window)
  }
}
