package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality census a pipeline runs before trusting
  * a new 100 TB drop: per column, row count, null count, distinct count.
  * Schema-dynamic (works on any DataFrame, the `COLUMNS(*) APPLY` idea as
  * programmatic column generation) and ONE scan: all per-column aggregates
  * ride in a single `agg`, then the 1×(3k+1) result row unpivots via `stack`
  * — no per-column jobs, no collect.
  *
  * Exact distinct counts plan through Spark's Expand (one extra row per
  * profiled column); at extreme width or scale swap `countDistinct` for
  * `approx_count_distinct` and the same single-scan shape holds with no
  * Expand (the HLL-vs-exact contract is pinned for q_distinct in
  * PropertySpec).
  */
object Profiling {

  def profile(df: DataFrame): DataFrame =
    profileWith(df, c => countDistinct(c))

  /** The 100 TB shape: `approx_count_distinct` (HLL++) instead of exact —
    * ONE pass with NO Expand in the plan (PropertySpec asserts both the
    * plan property and that every estimate lands within tolerance of the
    * exact census).
    */
  def profileApprox(df: DataFrame, rsd: Double = 0.02): DataFrame =
    profileWith(df, c => approx_count_distinct(c, rsd))

  /** Exact census without the Expand: one small aggregate JOB PER COLUMN,
    * submitted concurrently. A single `countDistinct` per job plans as a
    * plain two-level aggregate (partial distinct map-side) — no Expand —
    * and column pruning means each job scans ONLY its own column, so the
    * total bytes read equal the one-scan form while the aggregate processes
    * n rows per job instead of n·k expanded rows through k distinct
    * buffers. Values are identical to [[profile]] (pinned in PlansSpec);
    * the result is #columns driver-side scalars, same as the stack form.
    *
    * This is the 100 TB EXACT shape (the approx shape stays
    * [[profileApprox]]): at scale the Expand's k× row multiplication is the
    * dominant cost, while k concurrent column-pruned scans parallelize
    * across the cluster and each shuffle only that column's distinct
    * values.
    */
  def profileFast(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns.toSeq
    cols.foreach(c => require(!c.contains("`") && !c.contains("'"),
      s"cannot profile column with quote characters in its name: $c"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(cols.size, 8))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      val fs = cols.map { c =>
        scala.concurrent.Future {
          val r = df.agg(count(lit(1)).as("n"), count(col(s"`$c`")).as("nn"),
            countDistinct(col(s"`$c`")).as("nd")).head()
          (c, r.getLong(0), r.getLong(0) - r.getLong(1), r.getLong(2))
        }
      }
      // finite wait: a wedged executor pool must surface as a named error,
      // not an eternal hang (30 min >> any sane per-column aggregate)
      cols.zip(fs).map { case (c, f) =>
        try scala.concurrent.Await.result(f,
          scala.concurrent.duration.Duration(30, "min"))
        catch { case e: java.util.concurrent.TimeoutException =>
          throw new RuntimeException(
            s"profileFast: column-profile job for `$c` timed out after 30 min", e)
        }
      }.toDF("col_name", "n_rows", "n_nulls", "n_distinct")
    } finally pool.shutdown()
  }

  /** Zero-extra-pass data-quality counters via `Dataset.observe` (Spark's
    * CollectMetrics operator): the named aggregates ride the SAME job as
    * the pipeline's own action as accumulator-style partial aggregates, so
    * at 100 TB the counters are FREE — where [[profile]]/[[expectations]]
    * cost a dedicated scan, this is how a production pipeline watches row
    * counts and violation tallies on every write it was already doing.
    *
    * This helper attaches the metrics, drives one full materialization
    * through the noop sink (standing in for the pipeline's real write),
    * and returns the observed values as a one-row DataFrame. Metrics must
    * be non-distinct aggregates (the CollectMetrics contract) and, by this
    * repo's exactness discipline, integer-valued — enforced here so the
    * result hashes identically to a relational replay.
    */
  def observedCounters(df: DataFrame,
      metrics: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(metrics.nonEmpty, "need at least one observed metric")
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, metrics.head._2.as(metrics.head._1),
        metrics.tail.map { case (n, c) => c.as(n) }: _*)
      .write.format("noop").mode("overwrite").save()
    val got = obs.get
    val vals = metrics.map { case (n, _) =>
      got(n) match {
        case l: java.lang.Long    => l.longValue
        case i: java.lang.Integer => i.longValue
        case other => sys.error(
          s"observed metric `$n` must be integer-valued, got $other")
      }
    }
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(metrics.map { case (n, _) =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.LongType)
    })
    spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(vals: _*)), schema)
  }

  /** Data-expectation checks — the contract-validation gate (the
    * dbt-test / Great Expectations shape) a pipeline runs on every new
    * drop before it reaches training: each named rule counts the rows
    * VIOLATING its predicate, plus one key-uniqueness rule, and every rule
    * reports `(rule, n_rows, n_violations, pass)`.
    *
    * Shape: all predicate rules ride ONE scan as conditional sums in a
    * single aggregate (the [[profile]] posture), unpivoted via `stack`;
    * the uniqueness rule is one groupBy on the key with
    * `Σ(cnt) − #keys` as the violation count (rows that would need
    * dropping). NULL predicate results count as non-violations — nulls are
    * the not-null rules' job, mirroring SQL's three-valued CASE WHEN.
    */
  def expectations(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)],
      uniqueKey: Seq[String]): DataFrame = {
    require(rules.nonEmpty && uniqueKey.nonEmpty, "need rules and a unique key")
    rules.foreach { case (n, _) => require(!n.contains("'") && !n.contains("`"),
      s"cannot name a rule with quote characters: $n") }
    val aggs = count(lit(1)).cast("long").as("_n_rows_all") +:
      rules.zipWithIndex.map { case ((_, viol), i) =>
        sum(when(viol, 1L).otherwise(0L)).cast("long").as(s"_v_$i") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // backslashes are escape characters inside the generated SQL string
    // literal — double them so the emitted rule name round-trips verbatim
    // (same discipline as profileWith's col_name literals)
    val stackArgs = rules.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("\\", "\\\\")}', _n_rows_all, _v_$i"
    }.mkString(", ")
    val scanRules = row.selectExpr(
      s"stack(${rules.length}, $stackArgs) AS (rule, n_rows, n_violations)")
    val uniq = df.groupBy(uniqueKey.map(c => col(s"`$c`")): _*)
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).cast("long").as("n_rows"),
        (sum(col("cnt")) - count(lit(1))).cast("long").as("n_violations"))
      .select(lit("unique_" + uniqueKey.mkString("_")).as("rule"),
        col("n_rows"), col("n_violations"))
    scanRules.unionByName(uniq)
      .withColumn("pass", when(col("n_violations") === 0, 1L).otherwise(0L))
  }

  /** Per-column stats DRIFT between two generations of the same relation —
    * the monitoring gate that catches silent upstream changes (row-count
    * jumps, null floods, cardinality collapse) before a bad drop reaches
    * training. Both sides run the [[profile]] census (one scan each), then
    * one tiny join on column name — at 100 TB the joined relation is
    * #columns rows, so drift costs exactly two profile scans.
    */
  /** Per-column value-distribution ENTROPY census — the "is this column a
    * key, an enum, or noise" signal next to the count/null/distinct
    * profile: for each named column, the exact-integer surprise total
    * `Σ_v cnt_v · (bitlen(N) − bitlen(cnt_v))` (the unigramLm bitlen
    * discipline — a floor-log₂ entropy in bit·row units, zero for a
    * constant column, ≈ N·log₂(distinct) for a uniform one). Exact int64,
    * so the DuckDB oracle hash-matches.
    *
    * Shape: one value-keyed groupBy per column (map-side combined), one
    * aggregate — NO window anywhere: since Σ_v cnt_v = N, the surprise
    * total closes as `N·bitlen(N) − Σ_v cnt_v·bitlen(cnt_v)`, so the
    * scalar N never has to ride alongside the per-value rows (the previous
    * form carried it via a single-partition window over the distinct-value
    * relation — census-small for enums but UNBOUNDED for the key-like
    * columns this census exists to detect).
    */
  def entropyCensus(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("v"))
        .agg(count(lit(1)).as("cnt"))
      counts
        .agg(sum("cnt").as("n_rows"),
          count(lit(1)).as("n_distinct"),
          sum(expr("cnt * length(conv(cnt, 10, 2))")).as("sb"))
        .select(lit(c).as("col_name"),
          col("n_rows").cast("long").as("n_rows"), col("n_distinct"),
          (col("n_rows") * expr("length(conv(n_rows, 10, 2))") - col("sb"))
            .cast("long").as("surprise_bits"))
    }.reduce(_ unionByName _)

  def drift(before: DataFrame, after: DataFrame): DataFrame = {
    val b = profile(before).select(col("col_name"),
      col("n_rows").as("rows_before"), col("n_nulls").as("nulls_before"),
      col("n_distinct").as("distinct_before"))
    val a = profile(after).select(col("col_name"),
      col("n_rows").as("rows_after"), col("n_nulls").as("nulls_after"),
      col("n_distinct").as("distinct_after"))
    b.join(a, "col_name")
      .withColumn("rows_delta", col("rows_after") - col("rows_before"))
      .withColumn("distinct_delta",
        col("distinct_after") - col("distinct_before"))
  }

  /** Pairwise Pearson correlation census over pre-scaled INTEGER columns —
    * the relationship map next to [[profile]]'s per-column census. All
    * sufficient statistics (n, Σx, Σx², Σxy for every pair) ride ONE scan
    * as exact integer sums (order-independent, so partial aggregation
    * can't flake the hash); the correlation itself is then a fixed double
    * formula over those scalars — identical longs in, identical IEEE ops,
    * identical e6 fixed-point out in both engines.
    *
    * Callers pre-scale each column to integers sized so Σx² stays inside
    * long (e.g. dollars not cents for big prices); a constant column makes
    * its pairs NaN/undefined — that's the not-null/variance checks' job.
    */
  def correlations(df: DataFrame,
      cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    val aggs = count(lit(1)).cast("long").as("n") +:
      (cols.map { case (nm, c) => sum(c).cast("long").as(s"s_$nm") } ++
        cols.map { case (nm, c) => sum(c * c).cast("long").as(s"ss_$nm") } ++
        (for { i <- cols.indices; j <- cols.indices if i < j } yield {
          sum(cols(i)._2 * cols(j)._2).cast("long")
            .as(s"sp_${cols(i)._1}__${cols(j)._1}")
        }))
    val s = df.agg(aggs.head, aggs.tail: _*)
    // every pair's correlation derives from the ONE aggregate row — emit
    // them as an exploded struct array so the scan really does run once (a
    // per-pair select + union would recompute the full aggregate per pair)
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield {
      val nx = cols(i)._1
      val ny = cols(j)._1
      val n = col("n").cast("double")
      val num = n * col(s"sp_${nx}__$ny") -
        col(s"s_$nx").cast("double") * col(s"s_$ny")
      val den =
        sqrt(n * col(s"ss_$nx") - col(s"s_$nx").cast("double") * col(s"s_$nx")) *
          sqrt(n * col(s"ss_$ny") - col(s"s_$ny").cast("double") * col(s"s_$ny"))
      struct(lit(nx).as("col_x"), lit(ny).as("col_y"), col("n").as("n"),
        round(num / den * 1e6).cast("long").as("corr_e6"))
    }
    s.select(explode(array(pairs: _*)).as("p")).select(col("p.*"))
  }

  private def profileWith(df: DataFrame,
      distinctAgg: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : DataFrame = {
    val cols = df.columns.toSeq
    // backtick-quote everywhere so dotted names profile as columns, not as
    // struct-field paths; names containing the quote characters themselves
    // can't be expressed in the generated stack literal — fail loudly
    cols.foreach(c => require(!c.contains("`") && !c.contains("'"),
      s"cannot profile column with quote characters in its name: $c"))
    // positional internal aliases (_nn_0/_nd_0) — immune to a pre-existing
    // column that happens to be named like a name-derived alias
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(s"`$c`")).as(s"_nn_$i"),
      distinctAgg(col(s"`$c`")).as(s"_nd_$i")) } :+ count(lit(1)).as("_n_rows_all")
    val row = df.agg(aggs.head, aggs.tail: _*)
    // backslashes are escape characters inside the generated SQL string
    // literal — double them so the emitted col_name round-trips verbatim
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'${c.replace("\\", "\\\\")}', _n_rows_all, _n_rows_all - _nn_$i, _nd_$i"
    }.mkString(", ")
    row.selectExpr(
      s"stack(${cols.length}, $stackArgs) AS (col_name, n_rows, n_nulls, n_distinct)")
  }

  /** One referential-integrity row for a child(fk) → parent(pk)
    * relationship: child rows, null FKs, orphan rows (FK present, no
    * parent), and distinct orphan keys — the dbt `relationships` test as a
    * census instead of a boolean. One left join against the DISTINCT parent
    * key set: small parents (dimension tables) broadcast for free; a huge
    * parent shuffles both sides once on the key — never more than one pass
    * over the child.
    */
  def fkCheck(child: DataFrame, fk: String, parent: DataFrame, pk: String,
      rel: String): DataFrame = {
    val p = parent.select(col(pk).as("_pk")).distinct()
    val orphan = col("_fk").isNotNull && col("_pk").isNull
    child.select(col(fk).as("_fk"))
      .join(p, col("_fk") === col("_pk"), "left")
      .agg(
        count(lit(1)).cast("long").as("child_rows"),
        sum(when(col("_fk").isNull, 1L).otherwise(0L)).cast("long").as("null_fk"),
        sum(when(orphan, 1L).otherwise(0L)).cast("long").as("orphan_rows"),
        countDistinct(when(orphan, col("_fk"))).cast("long").as("orphan_keys"))
      .select(lit(rel).as("rel"), col("child_rows"), col("null_fk"),
        col("orphan_rows"), col("orphan_keys"))
  }

  /** The whole star's FK census in one relation: one [[fkCheck]] row per
    * declared relationship, unioned. Each check is an independent scan —
    * at scale they run as separate parallel jobs over different tables, so
    * there is nothing to fuse across them.
    */
  def fkIntegrity(
      rels: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    rels.map { case (rel, child, fk, parent, pk) =>
      fkCheck(child, fk, parent, pk, rel)
    }.reduce(_.unionByName(_))

  /** Zone-map skipping census — MEASURES what a layout buys, instead of
    * assuming it: lay the same rows out `nFiles` ways under each candidate
    * total order (exactly SQL `ntile(nFiles)`, via the range-partitioned
    * [[Ranking.globalNtile]] — never a single-partition window), collect the
    * per-file min/max zone maps of the two predicate columns `pk`/`sk`, and
    * for each box predicate count the files and rows a stats-based reader
    * would still scan (a file survives iff its [min,max] box overlaps the
    * predicate box in BOTH dimensions — the parquet row-group / lake-format
    * pruning rule). This is the decision procedure for choosing a 100 TB
    * table layout: the census runs on the k-byte zone maps, one
    * range-shuffle of the stats columns per candidate layout, and the
    * `rows_scanned` column is the I/O the layout would save — e.g. a
    * z-order layout keeps both dimensions' zone maps tight (good for 2-D
    * boxes) where a single-column sort is tight in its own column only.
    *
    * `rows` must carry `pk` and `sk` plus whatever the layout orders cite;
    * `preds` are `(name, lo_pk, hi_pk, lo_sk, hi_sk)` inclusive boxes.
    */
  def zonemapSkip(rows: DataFrame, layouts: Seq[(String, Seq[Column])],
      nFiles: Int, preds: Seq[(String, Long, Long, Long, Long)]): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    // persisted: each layout's globalNtile makes two passes (count +
    // zipWithIndex rank) — without the cache that is 2×|layouts| scans of
    // the input; with it, one scan feeds all of them. Par.widen (r18): the
    // cache build (z-value bit interleave) and each layout's range-exchange
    // write otherwise run single-task on a byte-starved scan.
    val cached = Par.widen(rows).persist()
    // materialize the cache ONCE before fanning out (below) — concurrent
    // first-touch from several threads would compute overlapping partitions
    cached.count()
    // CONCURRENT layout builds (r19, guide §2.6 — overlap independent
    // jobs): each layout's globalNtile runs its range-sample and
    // partition-count jobs at CONSTRUCTION, so building the three layouts
    // sequentially serialized ~6 driver-blocking jobs whose tasks leave
    // the machine idle; the layouts are fully independent (each reads only
    // the materialized cache), so their jobs overlap. Result order is the
    // caller's layout order (Future.sequence preserves it) and each branch
    // is deterministic on its own, so the union is unchanged.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val stats = Await.result(Future.sequence(layouts.map { case (name, order) =>
      Future {
        Ranking.globalNtile(cached, order, nFiles, "__zs_file")
          .groupBy("__zs_file")
          .agg(min("pk").as("mn_pk"), max("pk").as("mx_pk"),
            min("sk").as("mn_sk"), max("sk").as("mx_sk"),
            count(lit(1)).as("n"))
          .select(lit(name).as("layout"), col("mn_pk"), col("mx_pk"),
            col("mn_sk"), col("mx_sk"), col("n"))
      }
    }), scala.concurrent.duration.Duration.Inf).reduce(_.unionByName(_))
    val predDf = preds.toDF("pred", "lo_pk", "hi_pk", "lo_sk", "hi_sk")
    val scanned = col("mn_pk") <= col("hi_pk") && col("mx_pk") >= col("lo_pk") &&
      col("mn_sk") <= col("hi_sk") && col("mx_sk") >= col("lo_sk")
    stats.crossJoin(broadcast(predDf)) // nFiles×|preds| stat rows — tiny by construction
      .groupBy("layout", "pred")
      .agg(count(lit(1)).cast("long").as("files_total"),
        sum(when(scanned, 1L).otherwise(0L)).cast("long").as("files_scanned"),
        sum(when(scanned, col("n")).otherwise(lit(0L))).cast("long").as("rows_scanned"))
  }
}
