package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's SQL surface, verbatim on Spark: a user of
  * `clickhouse-k-means` interacts with NAMED VIEWS (`YH`, `WCR`,
  * `centroidsInit`, `nearestCentroid`, `deltaFinish` — k-means.sql:7-56) from
  * a shell loop (k-means.sh). This facade registers the same names as temp
  * views on a SparkSession, so `spark.sql("SELECT * FROM nearestCentroid")`
  * works exactly like `clickhouse-client -q` against the reference, and the
  * driver methods mirror the shell script line by line.
  *
  * State model: `WCR` is the reference's MergeTree append-log
  * (k-means.sql:11) — here a driver-held Vector of (step, j, C) rows,
  * re-registered after every insert. All views read "latest step" from it,
  * exactly like the reference's `max(step)` scalar subqueries; because the
  * log is k·steps rows, re-registration is O(k) and the data plane stays
  * fully distributed.
  *
  * Determinism divergences (documented, policy-consistent with the rest of
  * the engine): the reference's `rand32()` draws become a seeded PRNG
  * (rational u, exact integer-domain compare — `seedNextInverseCdf`), and
  * the Lloyd `avg` runs in fixed-point (`sum(round(y·scale)::long)`), so a
  * run is reproducible under any partitioning. `d1Weights = true` by
  * default: the surface replays the reference AS BUILT (k-means.sql:24
  * weights by plain distance — SURVEY.md Q1).
  */
final class ReferenceSurface(
    spark: SparkSession, yh: DataFrame, dim: Int = 2, seed: Long = 42L,
    d1Weights: Boolean = true, fxScale: Double = 1e4) {
  import KMeans.{Centroid, LogEntry}

  private var wcr = Vector.empty[LogEntry]
  private val rng = new scala.util.Random(seed)
  private val uDen = 1L << 30

  private def maxStep: Long = if (wcr.isEmpty) -1L else wcr.map(_.step).max
  /** Latest position per centroid id — the reference's
    * `order by step desc limit 1 by j` (k-means.sql:25).
    */
  private def latest: Seq[Centroid] = {
    val m = maxStep
    wcr.filter(_.step == m).map(e => Centroid(e.j, e.c)).sortBy(_.j)
  }
  /** Every coordinate ever logged — the anti-join set of k-means.sql:27
    * (`Y not in (select C from WCR)`, ALL steps).
    */
  private def everChosen: Seq[Centroid] =
    wcr.map(e => Centroid(e.j, e.c))

  registerViews()

  /** (Re-)register the five reference names; called after every insert. */
  private def registerViews(): Unit = {
    yh.createOrReplaceTempView("YH")

    val schema = StructType(Seq(
      StructField("step", LongType), StructField("j", LongType),
      StructField("C", ArrayType(DoubleType))))
    val rows: java.util.List[Row] =
      java.util.Arrays.asList(wcr.map(e => Row(e.step, e.j, e.c)): _*)
    spark.createDataFrame(rows, schema).createOrReplaceTempView("WCR")

    // nearestCentroid (k-means.sql:35-39): untupled coordinates y1..yN,
    // NEXT step number, nearest latest centroid
    if (wcr.isEmpty) {
      spark.catalog.dropTempView("nearestCentroid")
      spark.catalog.dropTempView("centroidsInit")
    } else {
      KMeans.assign(yh, latest).select(
        col("i") +:
          (1 to dim).map(d => element_at(col("Y"), d).as(s"y$d")) :+
          lit(maxStep + 1).as("step") :+ col("j"): _*)
        .createOrReplaceTempView("nearestCentroid")
    }

    // centroidsInit (k-means.sql:16-33): the next weighted draw as a
    // one-row (step, j, C) relation. The reference's per-SELECT rand32()
    // becomes a seeded rational drawn at registration time.
    if (wcr.nonEmpty) {
      val uNum = (rng.nextLong() & Long.MaxValue) % uDen
      // as-built fidelity: plain-distance weights (Q1) AND the group-by-Y
      // collapse (A10) — identical coordinates weigh once, like
      // k-means.sql:28
      KMeans.seedNextInverseCdf(yh, everChosen, uNum, uDen,
          weightScale = 1.0, d1Weights = d1Weights, dedupY = true)
        .select(lit(maxStep).as("step"), col("j"), col("Y").as("C"))
        .createOrReplaceTempView("centroidsInit")
    }

    // deltaFinish (k-means.sql:49-56, intended semantics): total movement
    // between the last two step positions per centroid, as the reference's
    // toUInt32(sum(d)*100) integer
    val steps = wcr.map(_.step).distinct.sorted
    val d =
      if (steps.size < 2) Long.MaxValue
      else {
        val prev = wcr.filter(_.step == steps(steps.size - 2)).map(e => Centroid(e.j, e.c))
        val cur = wcr.filter(_.step == steps.last).map(e => Centroid(e.j, e.c))
        (KMeans.movement(prev, cur) * 100).toLong
      }
    spark.createDataFrame(
        java.util.Arrays.asList(Row(d)),
        StructType(Seq(StructField("d", LongType))))
      .createOrReplaceTempView("deltaFinish")
  }

  // ---- the shell script, method by method (k-means.sh) ----

  /** `truncate table WCR` (k-means.sh:8). */
  def truncateWcr(): Unit = { wcr = Vector.empty; registerViews() }

  /** `insert into WCR select 0, 1, Y from YH limit <offset>,1`
    * (k-means.sh:9) — the shell-randomized first centroid, with the offset
    * drawn from the facade's seeded PRNG like `$RANDOM % 100`.
    */
  def insertFirstCentroid(maxOffset: Int = 100): Unit = {
    val c = KMeans.seedFirstRandom(yh, rng.nextLong(), maxOffset).head
    wcr = wcr :+ LogEntry(0L, 1L, c.c)
    registerViews()
  }

  /** `insert into WCR select * from centroidsInit` (k-means.sh:12). */
  def insertCentroidsInit(): Unit = {
    val drawn = spark.sql("SELECT step, j, C FROM centroidsInit").collect()
    wcr = wcr ++ drawn.map(r => LogEntry(r.getLong(0), r.getLong(1), r.getSeq[Double](2)))
    registerViews()
  }

  /** The Lloyd insert (k-means.sh:19-26 / k-means.sql:42-46): INSERT INTO
    * WCR the per-(j, step) coordinate means of `nearestCentroid` — run as
    * actual SQL text against the registered view, fixed-point per engine
    * policy.
    */
  def insertLloydStep(): Unit = {
    val avgs = (1 to dim).map(d =>
      s"CAST(sum(CAST(round(y$d * $fxScale) AS BIGINT)) AS DOUBLE)/$fxScale/count(*) AS y$d")
      .mkString(", ")
    val rows = spark.sql(
      s"SELECT step, j, $avgs FROM nearestCentroid GROUP BY j, step").collect()
    wcr = wcr ++ rows.map(r =>
      LogEntry(r.getLong(0), r.getLong(1), (1 to dim).map(d => r.getDouble(1 + d))))
    registerViews()
  }

  /** `select round(d) from deltaFinish` (k-means.sh:31). */
  def delta(): Long =
    spark.sql("SELECT d FROM deltaFinish").head().getLong(0)

  /** The whole script: init + seed k centroids + iterate until the delta
    * view reads 0 (k-means.sh:8-33). Returns the step count.
    */
  def run(k: Int, maxIter: Int = 50): Long = {
    truncateWcr()
    insertFirstCentroid()
    (2 to k).foreach(_ => insertCentroidsInit())
    var iter = 0
    while (delta() != 0 && iter < maxIter) { insertLloydStep(); iter += 1 }
    maxStep
  }

  /** The viz export (k-means.sh:36-45 / k-means.sql:58-66): x plus one
    * sparse column per centroid id, TSVWithNames with ' ' nulls.
    */
  def pivotTsv(path: String): Unit = {
    val ids = latest.map(_.j)
    val cols = ids.map(j => s"if(j = $j, y2, NULL) AS p$j").mkString(", ")
    graft.sources.Sinks.writeTsv(
      spark.sql(s"SELECT y1 AS x, $cols FROM nearestCentroid"), path)
  }

  /** Read-only view of the centroid log (the WCR table contents). */
  def log: Seq[LogEntry] = wcr
}
