package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact grouped quantiles by TWO-PASS DISTRIBUTED SELECTION — the plan
  * that holds when neither "buffer every value per group" (Spark's exact
  * `percentile`) nor "sort all distinct values" (a histogram + window
  * prefix) does:
  *
  *  1. one scan aggregates per-(group, value-bucket) counts — a few
  *     thousand rows regardless of data size — and the driver prefix-sums
  *     them to locate, for every requested quantile, the ONE bucket holding
  *     each needed order statistic;
  *  2. a second scan touches ONLY those buckets (≤ groups·quantiles·2 of
  *     them, each `bucketWidth` values wide), aggregates their exact
  *     per-value counts, and the driver reads the order statistics off the
  *     sorted runs.
  *
  * All counts are longs — exact under any partitioning — and the final
  * interpolation `v_lo + frac·(v_hi − v_lo)` is the same formula Spark's
  * `percentile` and DuckDB's `quantile_cont` evaluate, so results are
  * value-identical on integer inputs with fp-exact fractions (the
  * `q_quantiles` oracle pins this). Driver state: O(groups ·
  * range/bucketWidth) bucket counts — tune `bucketWidth` to the value
  * range, never to the row count.
  */
object Quantiles {

  /** Exact interpolated quantiles of `valueCol` (integral long) per
    * `groupCol`. Returns (group, cnt, q1, q2, …) with one column per
    * requested quantile, named by `qs`' labels.
    */
  def exactGroupedQuantiles(data: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[(String, Double)], bucketWidth: Long = 4096L): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q <= 1.0 })
    require(data.schema(groupCol).dataType == StringType,
      s"exactGroupedQuantiles: group column '$groupCol' must be STRING, " +
        s"got ${data.schema(groupCol).dataType.simpleString}")
    val spark = data.sparkSession
    val outSchema = StructType(
      StructField("g", StringType) +: StructField("cnt", LongType) +:
        qs.map { case (nm, _) => StructField(nm, DoubleType) })
    // pass 1: per-(group, bucket) counts. floor() keeps negative values in
    // their floor-division bucket (long `/` would truncate toward zero).
    val b = floor(col(valueCol) / lit(bucketWidth.toDouble)).cast("long")
    val buckets = data.groupBy(col(groupCol).as("g"), b.as("b"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    if (buckets.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](), outSchema)
        .withColumnRenamed("g", groupCol)

    // driver: per group, bucket prefix sums -> which (group, bucket) holds
    // each needed 0-based order statistic
    val byGroup = buckets.groupBy(_._1).map { case (g, rows) =>
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val offsets = sorted.map(_._2).scanLeft(0L)(_ + _) // exclusive prefix
      (g, sorted, offsets)
    }.toSeq.sortBy(_._1)
    final case class Need(g: String, bucket: Long, localRank: Long, tag: (String, Int))
    val needs = scala.collection.mutable.ArrayBuffer.empty[Need]
    byGroup.foreach { case (g, sorted, offsets) =>
      val n = offsets.last
      qs.zipWithIndex.foreach { case ((nm, q), _) =>
        val h = (n - 1) * q
        Seq(("lo", math.floor(h).toLong), ("hi", math.ceil(h).toLong)).foreach {
          case (side, idx) =>
            // order statistic idx lives in the bucket where cumBefore <= idx < cumThrough
            val bi = offsets.indexWhere(_ > idx) - 1
            needs += Need(g, sorted(bi)._1, idx - offsets(bi), (s"${nm}_$side", 0))
        }
      }
    }

    // pass 2: exact per-value counts inside ONLY the needed buckets
    val neededPairs = needs.map(nd => (nd.g, nd.bucket)).distinct
    val cond = neededPairs.map { case (g, bk) =>
      col(groupCol) === g && b === bk
    }.reduce(_ || _)
    val vals = data.filter(cond)
      .groupBy(col(groupCol).as("g"), b.as("b"), col(valueCol).as("c"))
      .agg(count(lit(1)).as("w"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sortBy(_._1) }

    // driver: read each order statistic off its bucket's sorted run, then
    // interpolate with the shared formula
    def statAt(g: String, bucket: Long, localRank: Long): Long = {
      var rest = localRank
      val run = vals((g, bucket))
      var i = 0
      while (rest >= run(i)._2) { rest -= run(i)._2; i += 1 }
      run(i)._1
    }
    val found = needs.map(nd =>
      (nd.g, nd.tag._1) -> statAt(nd.g, nd.bucket, nd.localRank)).toMap
    val out = byGroup.map { case (g, _, offsets) =>
      val n = offsets.last
      val ps = qs.map { case (nm, q) =>
        val h = (n - 1) * q
        val lo = found((g, s"${nm}_lo")).toDouble
        val hi = found((g, s"${nm}_hi")).toDouble
        lo + (h - math.floor(h)) * (hi - lo)
      }
      Row.fromSeq(g +: n +: ps)
    }
    spark.createDataFrame(java.util.Arrays.asList(out: _*), outSchema)
      .withColumnRenamed("g", groupCol)
  }

  /** Tukey-fence outlier census + winsorized totals per group — the robust
    * outlier rule data prep actually runs (clip to `[Q1 − 1.5·IQR,
    * Q3 + 1.5·IQR]`): exact quartiles from [[exactGroupedQuantiles]]'s
    * two-pass distributed selection, then ONE further scan counts the
    * outliers each side and folds the winsorized (clipped) sum.
    *
    * Everything lands integer-exact in ×8 fixed point: quartiles of longs
    * interpolate at quarter fractions (x.0/.25/.5/.75 — fp-exact, pinned
    * in PropertySpec), so `8·q` is an even integer and `1.5·IQR` in x8 is
    * `3·(q3−q1)x8 div 2` with an even dividend — no float ever reaches the
    * output. Scale shape: the quantile passes collect only bucket counts
    * (value-range-bounded driver state); the census is one scan joined to
    * the |groups|-row broadcast fence relation.
    *
    * Int64 bound (same discipline as `doc_curriculum`'s documented bound):
    * `win_sum_x8` folds per-group `sum(clip(value)·8)` as a LONG sum, so it
    * requires `rows_per_group · 8·max|value| < 2^63`; past that Spark wraps
    * silently while an ANSI engine widens (DuckDB sum(BIGINT) → HUGEINT)
    * and the engines diverge exactly when it matters. At the fixture's
    * value range (≤ ~5·10^5 × 8) that allows ~2.3·10^12 rows per group;
    * beyond it, pre-cast the clipped value to DECIMAL(38,0) before the sum
    * the way `q_moments` does.
    */
  def tukeyFences(data: DataFrame, groupCol: String, valueCol: String,
      bucketWidth: Long = 4096L): DataFrame = {
    val q = exactGroupedQuantiles(data, groupCol, valueCol,
      Seq(("q1", 0.25), ("q3", 0.75)), bucketWidth)
    val fences = q.select(col(groupCol), col("cnt").as("n"),
        round(col("q1") * 8).cast("long").as("q1_x8"),
        round(col("q3") * 8).cast("long").as("q3_x8"))
      .withColumn("iqr15_x8", expr("3 * (q3_x8 - q1_x8) div 2"))
      .select(col(groupCol), col("n"), col("q1_x8"), col("q3_x8"),
        (col("q1_x8") - col("iqr15_x8")).as("lo_x8"),
        (col("q3_x8") + col("iqr15_x8")).as("hi_x8"))
    val v8 = col(valueCol) * 8L
    data.join(broadcast(fences), groupCol)
      .groupBy(col(groupCol), col("n"), col("q1_x8"), col("q3_x8"),
        col("lo_x8"), col("hi_x8"))
      .agg(sum(when(v8 < col("lo_x8"), 1L).otherwise(0L)).as("n_low"),
        sum(when(v8 > col("hi_x8"), 1L).otherwise(0L)).as("n_high"),
        sum(greatest(col("lo_x8"), least(v8, col("hi_x8"))))
          .as("win_sum_x8"))
  }
}
