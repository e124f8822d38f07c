package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps._

/** Event-stream batch analytics: sessionization, tumbling-window aggregation,
  * JSON property extraction. (The Structured-Streaming twins of these live in
  * `graft.streaming`.)
  *
  * Timestamps cross the oracle boundary as integer MICROSECONDS
  * (`unix_micros` / DuckDB `epoch_us`) — exact, no float rounding, no
  * timezone ambiguity.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to the
    * user's previous event exceeds `gapMinutes`. One window partitioned by
    * user — shuffles once on user_id and scales with user cardinality.
    * Output: one row per session with event count and duration.
    */
  /** Per-event session tagging (the shared first half of [[sessionize]] and
    * [[topPaths]]): every event row gains `us` and its `session_id` within
    * the user's stream.
    */
  def sessionized(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val us = unix_micros(col("ts"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("us", us)
      .withColumn("new_s",
        when(col("us") - lag("us", 1).over(w) > gapUs, 1)
          .otherwise(when(lag("us", 1).over(w).isNull, 1).otherwise(0)))
      .withColumn("session_id",
        sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    sessionized(events, gapMinutes).groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("us").as("start_us"),
        (max("us") - min("us")).as("dur_us"))
      .select(col("user_id"), col("session_id").cast("long").as("session_id"),
        col("n_events"), col("start_us"), col("dur_us"))
  }

  /** Per-user rolling z-score anomaly flags — the telemetry-QA pass every
    * event pipeline runs before trusting a new drop: an event is anomalous
    * when its value sits ≥ `thrE6`/1e6 standard deviations from the mean of
    * the user's previous `lookback` events (the event's own value is
    * excluded from its baseline; users with fewer than `minHistory` prior
    * events are skipped — no self-justifying spikes, no cold-start noise).
    *
    * Oracle-exact discipline: the rolling sums are FIXED-POINT (integer
    * cents and squared cents over an explicit ROWS frame with a total
    * (ts, event_id) order), so both engines aggregate identical integers in
    * a deterministic frame; the mean/variance/z scalar math is the
    * identical IEEE sequence on those exact inputs, and the threshold
    * compares e6-rounded integers. Shape: ONE shuffle on user_id (shared
    * with every other per-user window op), everything else per-row.
    */
  def anomalies(events: DataFrame, lookback: Int = 50, minHistory: Int = 10,
      thrE6: Long = 3000000L): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("us", "event_id")
    val w = order.rowsBetween(-lookback, -1)
    val mean = col("s").cast("double") / 100.0 / col("n")
    val m2 = col("s2").cast("double") / 10000.0 / col("n")
    val sd = sqrt(greatest(m2 - mean * mean, lit(0.0)))
    val z = (col("cents").cast("double") / 100.0 - mean) / sd
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum("cents").over(w))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w))
      .filter(col("n") >= minHistory)
      .select(col("event_id"), col("user_id"), col("us"), col("n"),
        sd.as("sd"), round(z * 1e6).cast("long").as("z_e6"))
      .filter(col("sd") > 0 && abs(col("z_e6")) >= thrE6)
      .select(col("event_id"), col("user_id"), col("us"), col("n"), col("z_e6"))
  }

  /** Robust (median/MAD) anomaly flags — the outlier-resistant twin of
    * [[anomalies]]: a z-score baseline is itself dragged by the outliers
    * it hunts, so fraud/telemetry pipelines prefer deviation from the
    * MEDIAN in units of the Median Absolute Deviation. An event is flagged
    * when `|cents − med| ≥ thr · mad` over the user's full history (users
    * with < `minHistory` events or zero MAD are skipped).
    *
    * Exactness: medians over integer cents interpolate at x.0/x.5 — held
    * as `med2` = median·2, an EXACT integer. Deviations `dev2 = |2·cents −
    * med2|` are then integers in half-cents, their median interpolates at
    * quarter-cent grain — held as `mad4` = that median·2, integer in
    * quarter-cents — so the flag compare `dev2·2 ≥ thr·mad4` is pure
    * int64 arithmetic with no float tolerance anywhere. Shape: two
    * user-keyed aggregates + two co-partitioned joins, all on one
    * user_id shuffle key.
    */
  def anomaliesMad(events: DataFrame, thr: Int = 3,
      minHistory: Int = 10): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"),
      round(col("value") * 100).cast("long").as("cents"))
    // persisted: per-user and aggregated — `dev` is evaluated by both the
    // MAD rollup and the final filter, so without the cache the median
    // percentile aggregate over the corpus runs twice
    val med = e.groupBy("user_id").agg(count(lit(1)).as("n"),
      round(expr("percentile(cents, 0.5)") * 2).cast("long").as("med2"))
      .persist()
    val dev = e.join(med, "user_id")
      .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
    val mad = dev.groupBy("user_id")
      .agg(round(expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(mad, "user_id")
      .filter(col("n") >= minHistory && col("mad4") > 0 &&
        col("dev2") * 2 >= col("mad4") * thr)
      .select(col("event_id"), col("user_id"), col("cents"),
        col("med2"), col("mad4"), col("dev2"))
  }

  /** Windowed distinct-user census — the DAU/WAU-shaped count every event
    * pipeline reports: per epoch-aligned 1-hour bucket, the exact distinct
    * user count plus event volume. A single countDistinct per group plans
    * as a plain two-level aggregate (partial distinct map-side, no Expand);
    * at 100 TB the same shape swaps in `approx_count_distinct` exactly as
    * [[graft.operators.Profiling.profileApprox]] does for the census.
    */
  def activeUsers(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .select(unix_micros(col("w.start")).as("win_us"),
        col("n_users"), col("n_events"))

  /** Rolling 7-day distinct active users per day (WAU) next to the same
    * day's DAU, plus the DAU/WAU stickiness ratio — the rolling-DISTINCT
    * problem a plain window frame cannot express (distinct doesn't
    * decompose over frames). The scalable linearization: reduce to the
    * distinct (user, day) relation ONCE, explode each row into the
    * `windowDays` window-end days it contributes to (a bounded ×7 fan-out
    * of the reduced relation — never users × calendar), and count
    * distinct per target day. Days outside the observed set are dropped
    * by a semi-join so partial leading windows don't fabricate trailing
    * ghost days. One shuffle on (user, day), one on target_day.
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val ud = events.select(col("user_id"),
      expr("unix_micros(ts) div 86400000000").as("day")).distinct()
    val days = ud.select("day").distinct()
    val contrib = ud.withColumn("target_day",
        explode(sequence(col("day"), col("day") + (windowDays - 1))))
      .join(days.withColumnRenamed("day", "target_day"),
        Seq("target_day"), "left_semi")
    val wau = contrib.groupBy("target_day")
      .agg(countDistinct("user_id").as("wau"))
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    wau.join(dau, wau("target_day") === dau("day"))
      .select(col("day"), col("wau"), col("dau"),
        expr("dau * 1000000 div wau").as("stickiness_ppm"))
  }

  /** Tumbling-window aggregation (batch form of the streaming windowed agg):
    * epoch-aligned 1-hour buckets per event type.
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "1 hour").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sumFx(col("value"), 100.0).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-(user, hour) OHLC downsampling — the time-series compaction every
    * metrics store runs before long-range queries: first/last value in the
    * bucket (open/close) plus the exact extremes and volume. Open and close
    * are lexicographic min/max over `(µs, event_id, value)` structs —
    * event_id breaks timestamp ties, so the pick is deterministic and both
    * engines' positional struct comparison agrees. All outputs fixed-point
    * cents / integers. One shuffle on (hour, user) with full map-side
    * combine — the state per group is two structs and four scalars
    * regardless of bucket size, so the shape holds at any scale.
    */
  def ohlc(events: DataFrame): DataFrame = {
    val key = struct(unix_micros(col("ts")).as("k"),
      col("event_id").as("e"), col("value").as("v"))
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("user_id"))
      .agg(
        min(key).getField("v").as("open"),
        max(key).getField("v").as("close"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_us"), col("user_id"),
        round(col("open") * 100).cast("long").as("open_cents"),
        round(col("close") * 100).cast("long").as("close_cents"),
        round(col("high") * 100).cast("long").as("high_cents"),
        round(col("low") * 100).cast("long").as("low_cents"),
        col("n"))
  }

  /** Per-user sequence features — the lag/delta/rolling feature block a
    * sequence model trains on: previous value, step delta, inter-arrival
    * gap, and a trailing 3-event rolling sum, all per user in event-time
    * order (event_id breaks ts ties, so every window is deterministic).
    * Integer domain throughout (cents / µs), so the hash is stable.
    * One shuffle on user_id feeds every window — Spark evaluates the lag
    * and rolling frames over the same sort, no second exchange.
    */
  def lagFeatures(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val w3 = w.rowsBetween(-2, 0)
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("v_cents"))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("v_cents"),
        lag("v_cents", 1).over(w).as("lag1_cents"),
        (col("v_cents") - lag("v_cents", 1).over(w)).as("delta_cents"),
        (col("ts_us") - lag("ts_us", 1).over(w)).as("gap_us"),
        sum("v_cents").over(w3).as("roll_sum_cents"),
        count(lit(1)).over(w3).as("n_roll"))
  }

  /** Sparse→dense hourly regularization with carry-forward — the gap-fill
    * every time-series training/monitoring pipeline runs before a model
    * sees the data: per user, the dense hour spine spans first-to-last
    * activity (`sequence` + explode — no cross join against a global
    * calendar), missing hours join to null, and the last observed hourly
    * close carries forward via an `ignoreNulls` running `last` window.
    * The hourly close is the same deterministic struct-max pick as
    * [[ohlc]]. Gap rows are flagged so downstream can weight or mask them.
    *
    * Scale shape: one groupBy to the hourly grain, one per-user span
    * aggregate, one equi-join, one ordered window per user — all
    * partitioned on user_id; spine size is Σ user-spans, never
    * users × global-calendar.
    */
  def gapFill(events: DataFrame): DataFrame = {
    val key = struct(unix_micros(col("ts")).as("k"),
      col("event_id").as("e"), col("value").as("v"))
    val hourly = events
      .groupBy(col("user_id"),
        // exact integer FLOOR division, not bare `div` (truncation toward
        // zero): pre-1970 timestamps must land on the same hour grid as
        // ohlc's window()/date_trunc floor semantics. pmod makes the
        // numerator an exact multiple, then `div` keeps the whole
        // computation in longs (Column./ would round-trip through double)
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000)) div 3600000000")
          .as("hr"))
      .agg(max(key).getField("v").as("v_close"))
    val spine = hourly.groupBy("user_id")
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("hr")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    spine.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        round(last(col("v_close"), ignoreNulls = true).over(w) * 100)
          .cast("long").as("filled_cents"),
        when(col("v_close").isNull, 1L).otherwise(0L).as("is_gap"))
  }

  /** Hopping (sliding) window aggregation: 1-hour windows every 30 minutes —
    * each event contributes to width/slide = 2 epoch-aligned windows (the
    * smoother trend view next to [[windowAgg]]'s tumbling buckets). Spark's
    * `window(ts, width, slide)` expands the membership per row; one shuffle
    * on (window, type) with map-side partial aggregation, like the tumbling
    * form.
    */
  def slidingWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sumFx(col("value"), 100.0).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessions via Spark's built-in `session_window` — the
    * idiomatic one-liner next to [[sessionize]]'s explicit lag/cumsum form.
    * Window end = last event + gap by definition, and two events exactly
    * `gap` apart start a NEW session (merge requires diff < gap — the
    * built-in's boundary rule, which the oracle mirrors with `>=`;
    * [[sessionize]]'s `>` differs only on exact-boundary pairs).
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n_events"))

  /** As-of join without a join: for every `leftType` event, the timestamp of
    * the most recent `rightType` event by the same user at or before it
    * (classic event-to-state attribution, e.g. click → latest prior
    * purchase).
    *
    * Shape: tag both sides, UNION, one window over (user_id; ts) carrying
    * the last right-side timestamp forward with `last(ignoreNulls)`. ONE
    * shuffle on user_id and a linear pass per user — no range join, no
    * per-row probe; this is the form that survives a billion-event day.
    * Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), so
    * a same-instant right event matches, mirroring ASOF `l.ts >= r.ts`.
    * Unmatched left rows keep a NULL `asof_us`.
    */
  def asofJoin(events: DataFrame, leftType: String = "click",
      rightType: String = "purchase"): DataFrame = {
    val us = unix_micros(col("ts"))
    val lRows = events.filter(col("event_type") === leftType)
      .select(col("user_id"), us.as("us"), col("event_id").as("oid"),
        lit(1).as("tag"), lit(null).cast("long").as("r_us"))
    val rRows = events.filter(col("event_type") === rightType)
      .select(col("user_id"), us.as("us"), col("event_id").as("oid"),
        lit(0).as("tag"), us.as("r_us"))
    val w = Window.partitionBy("user_id").orderBy("us", "tag", "oid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lRows.unionAll(rRows)
      .withColumn("asof_us", last("r_us", ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("oid").as("event_id"), col("user_id"), col("us"), col("asof_us"))
  }

  /** [[asofJoin]] with a MAX-STALENESS tolerance (pandas `merge_asof
    * (tolerance=...)` semantics): a match older than `tolMinutes` is
    * treated as no match — the attribution/market-data rule that a stale
    * quote must not be carried indefinitely. Pure projection on top of the
    * as-of result (the fresh match's age rides along), so every physical
    * as-of form serves it unchanged: `native = true` plans it over the
    * [[asofJoinNative]] merge-scan exec, default over the union + window
    * composition (AsofJoinSpec pins the two identical).
    */
  def asofJoinTolerance(events: DataFrame, leftType: String = "click",
      rightType: String = "purchase", tolMinutes: Int = 60,
      native: Boolean = false): DataFrame = {
    val tolUs = tolMinutes * 60L * 1000000L
    val base = if (native) asofJoinNative(events, leftType, rightType)
               else asofJoin(events, leftType, rightType)
    base
      .select(col("event_id"), col("user_id"), col("us"),
        when(col("us") - col("asof_us") <= tolUs, col("asof_us")).as("asof_us"),
        when(col("us") - col("asof_us") <= tolUs, col("us") - col("asof_us"))
          .as("age_us"))
  }

  /** [[asofJoin]] as a NATIVE whole-operator plan: same output, but planned
    * through [[graft.plans.AsofJoinNode]] → [[graft.plans.AsofJoinExec]] — a
    * custom logical node, planner strategy, and merge-scan physical operator
    * with declared clustering/ordering requirements, instead of the
    * union + window composition. The strategy installs itself idempotently
    * on the session's experimental strategies.
    */
  def asofJoinNative(events: DataFrame, leftType: String = "click",
      rightType: String = "purchase",
      broadcast: Option[Boolean] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.types.LongType
    import graft.plans.{AsofJoinNode, AsofJoinStrategy}
    val spark = events.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
    val us = unix_micros(col("ts"))
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), us.as("us"))
    // fresh aliases give the right side fresh exprIds — both sides derive
    // from the same scan, and a hand-built node skips the analyzer's
    // self-join deduplication
    val r = events.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user_id"), us.as("r_us"))
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).getOrElse(
      sys.error(s"missing column $n"))
    val node = AsofJoinNode(lp, rp,
      attr(lp, "user_id"), attr(rp, "r_user_id"),
      attr(lp, "us"), attr(rp, "r_us"),
      lp.output, AttributeReference("asof_us", LongType, nullable = true)(),
      broadcastHint = broadcast)
    org.apache.spark.sql.GraftPlanShim.ofRows(spark, node)
      .select("event_id", "user_id", "us", "asof_us")
  }

  /** Staged conversion funnel (the `windowFunnel` analytic, e.g. reference
    * ecosystem's funnel analysis re-expressed relationally): for each stage
    * s ≥ 2, a user qualifies when they have a `stages(s)` event strictly
    * after their stage-(s-1) completion time and within `windowHours` of it;
    * completion time is the EARLIEST such event. Output: one row per stage
    * with the surviving user count.
    *
    * Shape: stage 1 is one grouped min per user; each later stage is an
    * equi-join on user_id against the previous stage's (user, t) relation
    * followed by a grouped min — all hash joins + partial aggregation, no
    * windows, no per-user sorting. At 100 TB each stage touches only that
    * stage's event-type slice (predicate pushed to the scan) and the
    * surviving-user relation shrinks monotonically, so later joins get
    * cheaper; AQE can broadcast the survivor side once it fits.
    */
  def funnel(events: DataFrame, stages: Seq[String] = Seq("view", "click", "purchase"),
      windowHours: Int = 24): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val reached = stageTimes(events, stages, windowHours)
    reached.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("stage"), lit(stages(i)).as("event_type"), col("users"))
    }.reduce(_.unionAll(_))
  }

  /** The funnel's per-stage first-completion times: stage i's relation is
    * (user_id, t) where t = the user's FIRST stage-i event falling inside
    * `windowHours` of their stage-(i−1) completion (chained, min-qualifying
    * — the [[funnel]] semantics, shared verbatim).
    */
  private def stageTimes(events: DataFrame, stages: Seq[String],
      windowHours: Int): Vector[DataFrame] = {
    val winUs = windowHours * 3600L * 1000000L
    // deliberately NOT persisted: each stage re-reads a 3-column,
    // type-filtered parquet scan (pushdown visible in the plan) — measured
    // at sf0.1, caching this corpus-scale projection costs MORE than the
    // pruned re-scans (0.74 s → 1.24 s), and at 100 TB a cached full-corpus
    // projection spills where distributed pruned scans don't. The CACHED
    // relations in this codebase are the aggregated, sub-corpus ones.
    val typed = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    stages.tail.foldLeft(Vector(
      typed.filter(col("event_type") === stages.head)
        .groupBy("user_id").agg(min("us").as("t")))) { (acc, st) =>
      val prev = acc.last.select(col("user_id"), col("t").as("tp"))
      acc :+ typed.filter(col("event_type") === st)
        .join(prev, "user_id")
        .filter(col("us") > col("tp") && col("us") <= col("tp") + winUs)
        .groupBy("user_id").agg(min("us").as("t"))
    }
  }

  /** Funnel sensitivity sweep: the same staged funnel evaluated at several
    * attribution windows side by side — the table that shows whether the
    * conversion story depends on the (always-arguable) window choice.
    * Monotone by construction (wider windows only add qualifying users);
    * each window is an independent [[funnel]] pass over the same chained
    * min-qualifying semantics.
    */
  def funnelSweep(events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      windows: Seq[Int] = Seq(1, 6, 24)): DataFrame =
    windows.map { wh =>
      funnel(events, stages, wh)
        .select(lit(wh.toLong).as("window_hours"), col("stage"),
          col("event_type"), col("users"))
    }.reduce(_ unionByName _)

  /** Stage-to-stage conversion LATENCY — the "how long does the funnel
    * take" companion to [[funnel]]'s "how many make it": for each
    * consecutive stage pair, the converting users' time deltas summarized
    * as exact integers (count, min, max, sum in µs) plus the median at
    * one-decimal fixed point (`percentile(_, 0.5)` over integer µs
    * interpolates x.0/x.5 — exact in a double, the qualityQuantileGate
    * parity discipline). Per pair: one equi-join of two user-keyed stage
    * relations + one scalar aggregate.
    */
  def funnelLatency(events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase"),
      windowHours: Int = 24): DataFrame = {
    require(stages.size >= 2, "latency needs at least two stages")
    val reached = stageTimes(events, stages, windowHours)
    (1 until reached.size).map { i =>
      val a = reached(i - 1).select(col("user_id"), col("t").as("ta"))
      val b = reached(i).select(col("user_id"), col("t").as("tb"))
      a.join(b, "user_id")
        .select((col("tb") - col("ta")).as("lat"))
        .agg(count(lit(1)).as("n_users"),
          min("lat").as("min_us"), max("lat").as("max_us"),
          // empty pair: SQL SUM over no rows is NULL — pin it to 0 so the
          // row stays integer-comparable (min/max/med stay NULL both here
          // and in the oracle)
          coalesce(sum("lat"), lit(0L)).as("sum_us"),
          expr("percentile(lat, 0.5)").as("med"))
        .select(lit(i.toLong).as("step"),
          lit(stages(i - 1)).as("from_type"), lit(stages(i)).as("to_type"),
          col("n_users"), col("min_us"), col("max_us"), col("sum_us"),
          round(col("med") * 10).cast("long").as("med_us_d10"))
    }.reduce(_.unionAll(_))
  }

  /** Exact SHAPLEY-value channel attribution — the third member of the
    * attribution trio (next to the Markov removal-effect and the
    * positional rule): each channel's credit is its average marginal
    * contribution to the conversion rate over every coalition ordering
    * (Shapley 1953, the unique symmetric/efficient/dummy-free split).
    * The coalition value is observational: v(S) = conversion rate (e6
    * fixed point) of the users whose EXPOSED CHANNEL SET is exactly S.
    * `channels` is the campaign's channel taxonomy — explicit config by
    * design (sorted, distinct, ≤ `maxChannels`, never the conversion
    * type), not data-derived, so the bit layout and the oracle's subset
    * table can never drift with a new event type.
    *
    * Shape: ONE distributed pass — per-user bitmask + conversion flag
    * (groupBy user_id with map-side partial max), then the ≤ 2^C-row
    * mask census — and an exact driver-side combination over the 2^C
    * subsets (the silhouette/assign discipline: the collected thing is
    * the bounded census, never rows). All integer math: the output
    * `shapley_scaled_e6` is the Shapley value × C! × 1e6 (the C!
    * absorbs the s!(C−1−s)!/C! ordering weights into exact integers;
    * negative values are real — a channel can depress conversion).
    */
  def attributionShapley(events: DataFrame, channels: Seq[String],
      conv: String = "purchase", maxChannels: Int = 8): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(channels.nonEmpty && channels.size <= maxChannels,
      s"channels must be 1..$maxChannels, got ${channels.size}")
    require(channels == channels.sorted && channels.distinct == channels,
      "channels must be sorted and distinct (the bit-layout contract)")
    require(!channels.contains(conv), "conversion type cannot be a channel")
    val nCh = channels.size
    val nMasks = 1 << nCh
    val flagCols = channels.zipWithIndex.map { case (ch, i) =>
      max(when(col("event_type") === ch, lit(1L << i)).otherwise(0L))
        .as(s"b$i")
    } :+ max(when(col("event_type") === conv, 1L).otherwise(0L)).as("cv")
    val perUser = events.groupBy("user_id")
      .agg(flagCols.head, flagCols.tail: _*)
      .select((0 until nCh).map(i => col(s"b$i")).reduce(_ + _).as("mask"),
        col("cv"))
    val census = perUser.groupBy("mask")
      .agg(count(lit(1)).as("users"), sum("cv").as("convs"))
      .as[(Long, Long, Long)].collect()
    val users = new Array[Long](nMasks)
    val convs = new Array[Long](nMasks)
    census.foreach { case (m, u, c) => users(m.toInt) = u; convs(m.toInt) = c }
    def vE6(m: Int): Long =
      if (users(m) == 0L) 0L else convs(m) * 1000000L / users(m)
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val rows = channels.zipWithIndex.map { case (ch, i) =>
      val bit = 1 << i
      var phi = 0L
      var exposed = 0L
      var m = 0
      while (m < nMasks) {
        if ((m & bit) == 0) {
          val s = java.lang.Integer.bitCount(m)
          phi += fact(s) * fact(nCh - s - 1) * (vE6(m | bit) - vE6(m))
        } else exposed += users(m)
        m += 1
      }
      (ch, exposed, phi)
    }
    spark.createDataset(rows)
      .toDF("channel", "users_exposed", "shapley_scaled_e6")
  }

  /** LCG constants and integer Poisson(1) inverse-CDF thresholds for
    * [[bootstrapCi]] — the SINGLE source both engines read (the oracle
    * builder emits these exact literals), so the per-(row, replicate)
    * weight can never drift between Spark and SQL. Thresholds are
    * floor(CDF_Poisson(1)(k)·M) for k = 0..7; a uniform u ∈ [0, M) maps
    * to the count of thresholds ≤ u, tail capped at 8 (mass ≈ 1.1e-5
    * merged into the cap — declared semantics, not an approximation
    * drift). The row id is reduced mod M BEFORE the multiply, so
    * `eid·A + C` stays < 2^63 for ANY id space (DuckDB errors on BIGINT
    * overflow rather than wrapping — the gap-LCG lesson).
    */
  val BootLcgA = 1103515245L
  val BootLcgM = 2147483647L
  val BootLcgC0 = 12345L
  val BootLcgCStep = 999983L
  val BootPoissonThresholds: Seq[Long] = {
    val p0 = math.exp(-1.0)
    val pdf = (1 to 7).scanLeft(p0)((p, k) => p / k)
    pdf.scanLeft(0.0)(_ + _).drop(1)
      .map(c => (c * BootLcgM.toDouble).toLong)
  }

  /** Poisson-bootstrap confidence interval for the mean conversion value —
    * the DISTRIBUTED bootstrap: classical resampling draws n rows WITH
    * replacement per replicate (a global shuffle per replicate — dead at
    * 100 TB), while the Poisson approximation gives every row an
    * independent Poisson(1) weight per replicate, so all `b` replicates
    * accumulate in ONE scan with map-side partial aggregation (shuffle
    * volume = b rows per partition, never data; the b× pre-aggregation
    * row inflation from the replicate explode never crosses the wire).
    * Weights are TRANSPARENT — the [[BootPoissonThresholds]] inverse CDF
    * over the shared LCG uniform — so the oracle replays them exactly.
    * Replicate means in exact e6 fixed point (value cents × 1e4, floor
    * division; Σw·cents·1e4 bounds the exact range to ~9e14 rows of
    * $100 events); the interval is the declared order-statistic rule
    * lo = sorted(1), hi = sorted(b−2) — the ~5th/95th percentile band at
    * b = 32 — over the b collected replicate means (b rows reach the
    * driver, never data: the silhouette/assign discipline).
    */
  def bootstrapCi(events: DataFrame, conv: String = "purchase",
      b: Int = 32): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    require(b >= 4, s"need at least 4 replicates for the CI rule, got $b")
    val p = events.filter(col("event_type") === conv)
      .select((col("event_id") % BootLcgM).as("eid"),
        round(col("value") * 100).cast("long").as("cents"))
    val u = ((col("eid") * BootLcgA + BootLcgC0 +
      col("rep") * BootLcgCStep) % BootLcgM).as("u")
    val wExpr = BootPoissonThresholds.zipWithIndex
      .foldLeft(when(lit(false), 0L)) { case (acc, (t, k)) =>
        acc.when(col("u") < t, k.toLong)
      }.otherwise(8L)
    val (n, sumCents) = p.agg(count(lit(1)), coalesce(sum("cents"), lit(0L)))
      .as[(Long, Long)].head()
    if (n == 0L)
      return Seq((0L, 0L, 0L, 0L)).toDF("n", "mean_e6", "lo_e6", "hi_e6")
    val reps = p
      .withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
      .select(col("rep"), col("cents"), u)
      .select(col("rep"), col("cents"), wExpr.as("w"))
      .groupBy("rep")
      .agg(sum(col("w") * col("cents")).as("swc"), sum("w").as("sw"))
      .as[(Int, Long, Long)].collect()
    val means = reps
      .map { case (_, swc, sw) => if (sw == 0L) 0L else swc * 10000L / sw }
      .sorted
    val meanE6 = sumCents * 10000L / n
    Seq((n, meanE6, means(1), means(b - 2)))
      .toDF("n", "mean_e6", "lo_e6", "hi_e6")
  }

  /** Multi-touch attribution — the credit assignment every conversion
    * pipeline runs: each purchase distributes exactly 1 000 000 ppm of
    * credit over the SAME user's clicks in the preceding `windowHours`.
    * Linear model with exact integer remainder handling: every touch gets
    * `1e6 div n`, and the LAST touch (latest click; event_id breaks ties)
    * absorbs the floor remainder, so per-purchase credit sums to exactly
    * 1e6 — no float drift, and last-touch/first-touch models are the
    * rnk = 1 / rnk = n row slices of the same output.
    *
    * Shape: per-user equi-join of the two event-type slices (predicates
    * pushed to the scan) with the window as a join-time filter, then two
    * windows over the purchase partition — one shuffle on user_id, one on
    * purchase_id. At 100 TB the pair relation is bounded by per-user
    * activity within the window, never |clicks| × |purchases|.
    */
  def attribution(events: DataFrame, clickType: String = "click",
      purchaseType: String = "purchase", windowHours: Int = 24): DataFrame = {
    val us = unix_micros(col("ts"))
    val winUs = windowHours * 3600L * 1000000L
    val p = events.filter(col("event_type") === purchaseType)
      .select(col("user_id"), col("event_id").as("purchase_id"), us.as("p_us"))
    val c = events.filter(col("event_type") === clickType)
      .select(col("user_id"), col("event_id").as("click_id"), us.as("c_us"))
    val pairs = p.join(c, Seq("user_id"))
      .filter(col("c_us") <= col("p_us") && col("c_us") > col("p_us") - winUs)
    val wAll = Window.partitionBy("purchase_id")
    val wOrd = Window.partitionBy("purchase_id")
      .orderBy(desc("c_us"), desc("click_id"))
    pairs
      .withColumn("n_touch", count(lit(1)).over(wAll))
      .withColumn("rnk", row_number().over(wOrd).cast("long"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("n_touch"), col("rnk"),
        when(col("rnk") === 1,
          lit(1000000L) - (col("n_touch") - 1) * expr("1000000 div n_touch"))
          .otherwise(expr("1000000 div n_touch")).as("credit_ppm"))
  }

  /** Position-based (U-shaped, 40/20/40) multi-touch attribution — the
    * industry-standard alternative to [[attribution]]'s linear split: the
    * FIRST and LAST touch each take 400 000 ppm, the middle touches split
    * the remaining 200 000 evenly. Same exact-integer remainder discipline
    * (the last touch absorbs the middle's floor remainder, so per-purchase
    * credit sums to exactly 1e6); degenerate journeys close exactly too
    * (1 touch → 1e6, 2 touches → 500 000 each). Ranks share [[attribution]]'s
    * convention: rnk 1 = latest click, rnk = n_touch = first. Same
    * per-user equi-join + purchase-window shape.
    */
  def attributionPosition(events: DataFrame, clickType: String = "click",
      purchaseType: String = "purchase", windowHours: Int = 24): DataFrame = {
    val us = unix_micros(col("ts"))
    val winUs = windowHours * 3600L * 1000000L
    val p = events.filter(col("event_type") === purchaseType)
      .select(col("user_id"), col("event_id").as("purchase_id"), us.as("p_us"))
    val c = events.filter(col("event_type") === clickType)
      .select(col("user_id"), col("event_id").as("click_id"), us.as("c_us"))
    val pairs = p.join(c, Seq("user_id"))
      .filter(col("c_us") <= col("p_us") && col("c_us") > col("p_us") - winUs)
    val wAll = Window.partitionBy("purchase_id")
    val wOrd = Window.partitionBy("purchase_id")
      .orderBy(desc("c_us"), desc("click_id"))
    val mid = expr("200000 div (n_touch - 2)")
    pairs
      .withColumn("n_touch", count(lit(1)).over(wAll))
      .withColumn("rnk", row_number().over(wOrd).cast("long"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("n_touch"), col("rnk"),
        when(col("n_touch") === 1, lit(1000000L))
          .when(col("n_touch") === 2, lit(500000L))
          .when(col("rnk") === col("n_touch"), lit(400000L)) // first touch
          .when(col("rnk") === 1,                            // last absorbs
            lit(600000L) - (col("n_touch") - 2) * mid)
          .otherwise(mid).as("credit_ppm"))
  }

  /** Top event-type PATHS: the most common length-`n` event sequences within
    * a session across all sessions (the classic "what do users actually do"
    * path analysis). Each session's events are ordered by (us, event_id) —
    * a total order, so the extracted n-grams are a pure function of the
    * data — and every sliding window of `n` consecutive types counts once.
    *
    * Shape: the sessionize window (one shuffle on user_id), one grouped
    * sort_array(collect_list) per session — state bounded by session length,
    * not stream history — then an explode + count + top-k. At 100 TB the
    * heavy relation is (sessions × grams-per-session) rows flowing into a
    * map-side-combined count.
    */
  def topPaths(events: DataFrame, n: Int = 3, k: Int = 20,
      gapMinutes: Int = 30): DataFrame = {
    val types = sessionized(events, gapMinutes)
      .groupBy("user_id", "session_id")
      .agg(sort_array(collect_list(struct(
        col("us"), col("event_id"), col("event_type")))).as("evs"))
      .select(transform(col("evs"), e => e.getField("event_type")).as("types"))
      .filter(size(col("types")) >= n) // guard: sequence(1, size-n+1) must ascend
    val grams = types.select(explode(transform(
      sequence(lit(1), size(col("types")) - (n - 1)),
      s => concat_ws(">", slice(col("types"), s, lit(n))))).as("path"))
    grams.groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("path"))
      .limit(k)
  }

  /** DAU/WAU/MAU stickiness census — the engagement table every product
    * dashboard leads with: per observed day, the exact distinct users
    * active that day (DAU), within the trailing 7 days (WAU), within the
    * trailing 30 days (MAU), and the DAU/WAU + DAU/MAU stickiness ratios
    * in exact ppm.
    *
    * Shape: events reduce ONCE to the distinct (user, day) relation — the
    * only corpus-scale shuffle, and far smaller than the event stream.
    * Trailing windows then come from an explode of each (user, day) onto
    * the ≤7/≤30 future days it covers (a bounded fan-out of the REDUCED
    * relation — never a range join, never a per-day rescan), distinct, and
    * a grouped count. The inner join back to DAU restricts output to days
    * that actually occur.
    */
  def stickiness(events: DataFrame): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val ud = events.select(col("user_id"), day.as("day")).distinct()
    val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
    def trailing(n: Int, name: String) = ud
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (n - 1))).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as(name))
    dau.join(trailing(7, "wau"), "day").join(trailing(30, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("dau * 1000000 div wau").as("dw_ppm"),
        expr("dau * 1000000 div mau").as("dm_ppm"))
  }

  /** CUSUM control chart over the deseasonalized daily series — the
    * level-SHIFT detector that complements per-event outlier flags: a
    * sustained small drift accumulates where a z-score never fires. The
    * textbook recursion `s_i = max(0, s_{i−1} + dev_i)` is evaluated in
    * CLOSED FORM as `s_i = p_i − min(0, min_{j≤i} p_j)` (p = running sum
    * of deviations) — a prefix sum plus a running min, so the whole chart
    * is two ordered windows instead of a sequential loop, and the DuckDB
    * oracle replays it relationally. Both directions are charted (the
    * downward side runs the identity on −dev); the alarm threshold is
    * 4 × the mean absolute deviation, all integer cents.
    *
    * The ordered windows run over the DAILY relation — day-count-bounded
    * by contract (the km_seed_next single-partition-window discipline), a
    * few thousand rows for a decade of data.
    */
  def cusum(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      .withColumn("dow", expr("(day_us div 86400000000) % 7"))
    val prof = daily.groupBy("dow")
      .agg(expr("sum(cents) div count(*)").as("dow_mean_cents"))
    val resid = daily.join(prof, "dow")
      .select(col("day_us"), (col("cents") - col("dow_mean_cents")).as("resid"))
    val w = Window.orderBy("day_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(lit(1))
    resid
      .withColumn("p", sum("resid").over(w))
      .withColumn("cusum_pos", col("p") - least(min("p").over(w), lit(0L)))
      .withColumn("q", sum(-col("resid")).over(w))
      .withColumn("cusum_neg", col("q") - least(min("q").over(w), lit(0L)))
      .withColumn("sab", sum(abs(col("resid"))).over(all))
      .withColumn("nd", count(lit(1)).over(all))
      .withColumn("h", expr("(sab * 4) div nd"))
      .select(col("day_us"), col("resid"),
        col("cusum_pos"), col("cusum_neg"), col("h").as("h_cents"),
        (col("cusum_pos") > col("h") || col("cusum_neg") > col("h"))
          .as("alarm"))
  }

  /** First-order Markov transition matrix over within-session event
    * sequences: for every ordered `(from_type, to_type)` pair of CONSECUTIVE
    * events (same user, same session — the [[sessionized]] gap rule, so
    * overnight returns don't fabricate transitions), the count and the
    * row-normalized probability in exact ppm. The companion to [[topPaths]]:
    * paths surface the frequent whole journeys, this gives the full
    * next-step distribution that journey simulation / next-event prediction
    * conditions on.
    *
    * Shape: ONE shuffle on user_id (the shared events-family partitioning)
    * for the lead window; the matrix itself is |types|² rows, so the
    * normalizing window is over a trivially small relation.
    */
  def transitions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id", "session_id")
      .orderBy(col("us"), col("event_id"))
    val matrix = sessionized(events, gapMinutes)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    matrix
      .withColumn("row_total", sum("cnt").over(Window.partitionBy("from_type")))
      .select(col("from_type"), col("to_type"), col("cnt"),
        expr("cnt * 1000000 div row_total").as("p_ppm"))
  }

  /** Markov-chain (removal-effect) attribution — the data-driven model next
    * to [[attribution]]'s linear and U-shaped heuristics: each session is a
    * journey START → states → CONV (truncated at its first `conv` event) or
    * → NULL (no conversion), transition probabilities in integer ppm, and
    * every channel's credit is its REMOVAL EFFECT — how much of the
    * chain's START→CONV absorption probability disappears when all
    * transitions into that channel are redirected to NULL (Anderl et al.
    * 2014). One row per channel: the chain's conversion probability
    * without it, the removal effect, and the normalized credit share.
    *
    * Absorption runs as `iters` bounded value-iteration steps in PURE
    * INTEGER ppm — `p'(s) = (Σ_t P_ppm(s,t)·p(t)) div 10⁶`, absorbing
    * states fixed — so the whole computation (redirect included) replays
    * as unrolled ANSI CTEs and the oracle is hash-exact. The per-step div
    * truncation under-counts by < |states| ppm per step; with CONV=10⁶ the
    * iteration converges from below to the exact absorption probability.
    *
    * Scale shape: the corpus-scale work is [[sessionized]]'s one shuffle +
    * the edge groupBy; the transition matrix is |event types|²-bounded BY
    * CONTRACT (guarded), and the value iteration is k-sized driver state —
    * the km-family discipline.
    */
  def attributionMarkov(events: DataFrame, conv: String = "purchase",
      gapMinutes: Int = 30, iters: Int = 20, maxStates: Int = 64): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val wS = Window.partitionBy("user_id", "session_id")
      .orderBy(col("us"), col("event_id"))
    val s = sessionized(events, gapMinutes)
      .withColumn("rn", row_number().over(wS))
    val convPos = s.filter(col("event_type") === conv)
      .groupBy("user_id", "session_id").agg(min("rn").as("cpos"))
    val st = s.join(convPos, Seq("user_id", "session_id"), "left")
      .filter(col("cpos").isNull || col("rn") <= col("cpos"))
      .withColumn("state", when(col("rn") === col("cpos"), lit("CONV"))
        .otherwise(col("event_type")))
    val wR = Window.partitionBy("user_id", "session_id").orderBy("rn")
    val within = st
      .withColumn("from_state",
        coalesce(lag("state", 1).over(wR), lit("START")))
      .select(col("from_state"), col("state").as("to_state"))
    val terminal = st
      .withColumn("mx", max("rn").over(
        Window.partitionBy("user_id", "session_id")))
      .filter(col("cpos").isNull && col("rn") === col("mx"))
      .select(col("state").as("from_state"), lit("NULL").as("to_state"))
    val mat = within.unionByName(terminal)
      .groupBy("from_state", "to_state").agg(count(lit(1)).as("cnt"))
      .withColumn("row_total",
        sum("cnt").over(Window.partitionBy("from_state")))
      .select(col("from_state"), col("to_state"),
        expr("cnt * 1000000 div row_total").as("p_ppm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(mat.length <= maxStates * maxStates,
      s"transition matrix has ${mat.length} edges — event-type cardinality " +
        s"broke the bounded-state contract (maxStates = $maxStates)")
    // the framing states are SENTINELS: an event_type literally named
    // 'START'/'CONV'/'NULL' (or '', the oracle's base-variant marker) would
    // silently merge with the framing — and Spark would value-iterate a
    // literal 'NULL' as a transient from-state while the oracle pins it
    // absorbing at 0. One pushed-filter limit-1 probe fails loudly instead
    // of diverging (the maxStates-guard discipline).
    val clash = events.select(col("event_type"))
      .filter(col("event_type").isin("START", "CONV", "NULL", ""))
      .limit(1).collect()
    require(clash.isEmpty,
      s"event_type '${clash.headOption.map(_.getString(0)).getOrElse("")}' " +
        "collides with a reserved Markov sentinel state (START/CONV/NULL/''); " +
        "rename it upstream")
    val transient = mat.map(_._1).distinct.sorted
    def absorb(removed: Option[String]): Long = {
      val m = mat.map { case (f, t, p) =>
        (f, if (removed.contains(t)) "NULL" else t, p) }
      val p = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      p("CONV") = 1000000L
      (1 to iters).foreach { _ =>
        val np = transient.map { s0 =>
          s0 -> m.iterator.filter(_._1 == s0)
            .map { case (_, t, pp) => pp * p(t) }.sum / 1000000L
        }
        np.foreach { case (s0, v) => p(s0) = v }
      }
      p("START")
    }
    val base = absorb(None)
    val channels = transient.filter(_ != "START")
    val rows = channels.map { c =>
      val pw = absorb(Some(c))
      (c, pw, if (base > 0) (base - pw) * 1000000L / base else 0L)
    }
    val remTot = rows.map(_._3).sum
    rows.toSeq.map { case (c, pw, rem) =>
      (c, pw, rem, if (remTot > 0) rem * 1000000L / remTot else 0L)
    }.toDF("channel", "p_without_ppm", "removal_ppm", "share_ppm")
  }

  /** Cohort retention: users are grouped into epoch-week cohorts by their
    * FIRST `cohortType` event; a cohort member counts as retained at offset
    * k when they have ANY event in cohort_week + k. Weeks are integer
    * epoch-microsecond division (`div`) — exact and engine-independent.
    *
    * Shape: one grouped min for the cohort relation, one distinct over
    * (user, week) for activity, then an equi-join on user_id + a grouped
    * count — the (user, week) distinct is the only wide state and it's
    * bounded by users × observed weeks.
    */
  def retention(events: DataFrame, cohortType: String = "signup",
      maxOffset: Int = 3): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val week = expr(s"unix_micros(ts) div $weekUs")
    val cohorts = events.filter(col("event_type") === cohortType)
      .groupBy("user_id")
      .agg(expr(s"min(unix_micros(ts)) div $weekUs").as("cohort_week"))
    val active = events.select(col("user_id"), week.as("week")).distinct()
    cohorts.join(active, "user_id")
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .filter(col("week_offset") >= 0 && col("week_offset") <= maxOffset)
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("users")) // (user, week) distinct ⇒ rows unique
  }

  /** Cohort LTV curve — the revenue companion to [[retention]]: per signup
    * cohort, cumulative revenue per cohort user by week offset. A DENSE
    * spine (cohort × offsets 0..maxOffset via `sequence`/`explode`) makes
    * the cumulative window well-defined even for zero-revenue cells — the
    * [[gapFill]] discipline. Exact integers end to end: cents sums, a
    * rows-frame cumulative over the spine, and `div` for cents-per-user.
    *
    * Scale shape: one shuffle on user_id for the cohort join, one on
    * (cohort_week, offset) for the cell sums; the spine is |cohorts| ×
    * (maxOffset+1) rows — weeks, not users — so the cumulative window's
    * partitions are trivially small. Never a users × calendar blow-up.
    */
  def cohortLtv(events: DataFrame, cohortType: String = "signup",
      revenueType: String = "purchase", maxOffset: Int = 3): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val cohorts = events.filter(col("event_type") === cohortType)
      .groupBy("user_id")
      .agg(expr(s"min(unix_micros(ts)) div $weekUs").as("cohort_week"))
    val sizes = cohorts.groupBy("cohort_week").agg(count(lit(1)).as("n_users"))
    val cells = events.filter(col("event_type") === revenueType)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $weekUs").as("week"),
        round(col("value") * 100).cast("long").as("cents"))
      .join(cohorts, "user_id")
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .filter(col("week_offset") >= 0 && col("week_offset") <= maxOffset)
      .groupBy("cohort_week", "week_offset").agg(sum("cents").as("cents"))
    val spine = sizes.select(col("cohort_week"), col("n_users"),
      explode(sequence(lit(0L), lit(maxOffset.toLong))).as("week_offset"))
    val w = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(cells, Seq("cohort_week", "week_offset"), "left")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        coalesce(col("cents"), lit(0L)).as("cents"))
      .withColumn("cum_cents", sum("cents").over(w))
      .withColumn("ltv_cents", expr("cum_cents div n_users"))
  }

  /** JSON property extraction + rollup: pull `props.k` (the only key in the
    * synthetic data) and aggregate per event type. At scale this is a single
    * narrow scan — extraction is a per-row codegen'd path expression.
    */
  def jsonStats(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    events.select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        (sum("k") / count(lit(1))).as("avg_k"))
  }

  /** Two-proportion A/B conversion analysis: users split by a
    * deterministic assignment hash (`user_id % 2` — the stand-in for a
    * salted experiment hash), conversion = reached the goal event at least
    * once, and the pooled two-proportion z² statistic next to the per-arm
    * rates. Sufficient statistics (per-arm user and converter counts) are
    * EXACT integers from one distinct-shuffle pass; the z² is then a fixed
    * double formula over them — the q_corr determinism recipe (+,-,×,÷ and
    * sqrt are correctly-rounded IEEE, so both engines agree bit-for-bit;
    * no transcendentals). One output row; z2_e6 ≥ ~3.84e6 rejects at 95%.
    */
  /** The conversion rule shared by [[abTest]] and [[powerMde]] — goal
    * events outnumber baseline events for the user: a scale-free
    * behavioral split (a fixed "did X at least once" saturates to 100% on
    * dense activity streams and degenerates the pooled variance). One
    * definition so the test and its planner can never disagree on what a
    * conversion is.
    */
  private[operators] def convAgg(goal: String, baseline: String) =
    (sum(when(col("event_type") === goal, 1L).otherwise(0L)) >
      sum(when(col("event_type") === baseline, 1L).otherwise(0L)))
      .cast("long").as("conv")

  def abTest(events: DataFrame,
      goal: String = "purchase", baseline: String = "view"): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
      .agg(convAgg(goal, baseline))
    val s = perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c_a"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c_b"))
    val (na, ca, nb, cb) = (col("n_a").cast("double"), col("c_a").cast("double"),
      col("n_b").cast("double"), col("c_b").cast("double"))
    val p = (ca + cb) / (na + nb)
    val z2 = (ca / na - cb / nb) * (ca / na - cb / nb) /
      (p * (lit(1.0) - p) * (lit(1.0) / na + lit(1.0) / nb))
    // degenerate designs (an empty arm, 0% or 100% pooled rate) have no
    // defined z²: emit null rather than tripping ANSI divide-by-zero —
    // when/otherwise evaluates branches lazily, so the division never runs
    val ok = col("n_a") > 0 && col("n_b") > 0 &&
      col("c_a") + col("c_b") > 0 && col("c_a") + col("c_b") < col("n_a") + col("n_b")
    // SRM guardrail: χ² against the designed 50/50 split — a broken
    // assignment pipeline invalidates the test before any metric is read.
    // (na−E)²/E + (nb−E)²/E with E = (na+nb)/2; exact integer numerators
    val srm = ((na - (na + nb) / 2) * (na - (na + nb) / 2) / ((na + nb) / 2)) +
      ((nb - (na + nb) / 2) * (nb - (na + nb) / 2) / ((na + nb) / 2))
    s.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      expr("(c_a * 1000000) div n_a").as("rate_a_ppm"),
      expr("(c_b * 1000000) div n_b").as("rate_b_ppm"),
      when(ok, round(z2 * 1e6).cast("long")).otherwise(lit(null)).as("z2_e6"),
      when(col("n_a") + col("n_b") > 0, round(srm * 1e6).cast("long"))
        .otherwise(lit(null)).as("srm_chi2_e6"))
  }

  /** A/B sample-size planner — the question asked BEFORE [[abTest]] runs:
    * at the corpus's measured conversion rate, how many users per arm does
    * each relative MDE (minimum detectable effect) need at α = 0.05
    * two-sided / 80% power? The two-proportion closed form
    * `n = (z_{α/2}+z_β)²·(p₁(1−p₁)+p₂(1−p₂))/δ²` with the z quantiles as
    * fixed literals (1.959963984540054, 0.8416212335729143 — the public
    * constants, interpolated identically into both engines), ceil'd to an
    * integer. One row per MDE: baseline/alternative rates in e6 ppm and
    * the required n (null when the alternative rate reaches 1 — the effect
    * is undetectable by a proportion test).
    *
    * Determinism: the measured p comes from exact integer sufficient
    * statistics ([[abTest]]'s conversion rule); everything after is a
    * fixed double formula in mirrored op order — the q_corr recipe.
    * One distinct-shuffle pass; the MDE grid is a literal explode.
    */
  def powerMde(events: DataFrame, goal: String = "purchase",
      baseline: String = "view",
      mdePcts: Seq[Int] = Seq(5, 10, 20, 50)): DataFrame = {
    val z = 1.959963984540054 + 0.8416212335729143
    val z2 = z * z
    val perUser = events
      .groupBy(col("user_id"))
      .agg(convAgg(goal, baseline))
    val s = perUser.agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val p = col("c").cast("double") / col("n").cast("double")
    val mde = col("mde_pct").cast("double") / lit(100.0)
    val p2 = p * (lit(1.0) + mde)
    val delta = p * mde
    val nReq = ceil(lit(z2) * (p * (lit(1.0) - p) + p2 * (lit(1.0) - p2)) /
      (delta * delta))
    s.select(explode(typedlit(mdePcts.map(_.toLong))).as("mde_pct"),
        col("n"), col("c"))
      .select(col("mde_pct"),
        round(p * 1e6).cast("long").as("p_base_ppm"),
        round(p2 * 1e6).cast("long").as("p_alt_ppm"),
        when(p > 0 && p2 < 1, nReq.cast("long")).otherwise(lit(null))
          .as("n_per_arm"))
  }

  /** CUPED variance reduction (Deng et al. 2013): adjust each arm's
    * experiment-period metric with the pre-period covariate,
    * `adj = mean(y) − θ·(mean(x) − mean_all(x))` with the pooled
    * `θ = cov(x,y)/var(x)`, and report the guaranteed variance cut
    * `ρ²(x,y)` (CUPED removes exactly the covariate-explained share).
    * Here x/y = the user's first-half / second-half event counts and the
    * arm is the deterministic assignment hash. ONE aggregate pass
    * produces every sufficient statistic as an exact integer (counts,
    * Σx, Σy, Σx², Σxy, Σy², per-arm sums via conditional sums); the
    * estimates are then fixed double formulas over them — the q_corr
    * determinism recipe, so the oracle is hash-exact.
    */
  def cuped(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
      .agg(sum(when(dayofmonth(col("ts")) <= 15, 1L).otherwise(0L)).as("x"),
        sum(when(dayofmonth(col("ts")) > 15, 1L).otherwise(0L)).as("y"))
    val g = perUser.agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === 0, col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("sya"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("arm") === 1, col("x")).otherwise(0L)).as("sxb"),
      sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("syb"))
    def d(c: String) = col(c).cast("double")
    val num = d("n") * d("sxy") - d("sx") * d("sy")
    val denx = d("n") * d("sxx") - d("sx") * d("sx")
    val deny = d("n") * d("syy") - d("sy") * d("sy")
    val theta = num / denx
    val meanX = d("sx") / d("n")
    def adj(sy: String, sx: String, nn: String) =
      d(sy) / d(nn) - theta * (d(sx) / d(nn) - meanX)
    val ok = col("na") > 0 && col("nb") > 0 && denx > 0 && deny > 0
    g.select(col("n"), col("na"), col("nb"),
      when(ok, round(theta * 1e6).cast("long")).otherwise(lit(null)).as("theta_e6"),
      when(ok, round(num * num / (denx * deny) * lit(1e6)).cast("long"))
        .otherwise(lit(null)).as("rho2_ppm"),
      when(ok, round(d("sya") / d("na") * 1e6).cast("long")).otherwise(lit(null))
        .as("raw_a_e6"),
      when(ok, round(adj("sya", "sxa", "na") * 1e6).cast("long")).otherwise(lit(null))
        .as("adj_a_e6"),
      when(ok, round(d("syb") / d("nb") * 1e6).cast("long")).otherwise(lit(null))
        .as("raw_b_e6"),
      when(ok, round(adj("syb", "sxb", "nb") * 1e6).cast("long")).otherwise(lit(null))
        .as("adj_b_e6"))
  }

  /** Difference-in-differences estimator — the quasi-experimental cousin of
    * [[abTest]]/[[cuped]]: each user's spend (exact integer cents) is split
    * into pre (day ≤ 15) and post (day > 15) periods, the per-user change
    * `d = post − pre` is averaged per arm (`user_id % 2` — treatment vs
    * control), and the DiD effect is `mean(d_treat) − mean(d_ctrl)` with its
    * t² statistic from the per-arm sample variances of `d`
    * (`SE² = var(d_t)/n_t + var(d_c)/n_c`).
    *
    * Determinism recipe as [[cuped]]: ONE aggregate pass folds every
    * sufficient statistic (per-arm user counts, Σd, Σd²) as an exact long;
    * the estimates are fixed double formulas over them, so the DuckDB
    * oracle is hash-exact. Int64 bound: Σd² needs
    * `users_per_arm · (max |per-user cents diff|)² < 2^63` — at the
    * fixture's spend range (~10^6 cents per user) that allows ~10^6 users
    * per arm; past it, widen d·d to DECIMAL(38,0) the way q_moments does.
    *
    * Scale shape: one shuffle on user_id (the per-user period sums), then a
    * scalar aggregate — the same two-stage plan at any corpus size.
    */
  def diffInDiff(events: DataFrame): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val perUser = events
      .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
      .agg(sum(when(dayofmonth(col("ts")) <= 15, cents).otherwise(0L)).as("x"),
        sum(when(dayofmonth(col("ts")) > 15, cents).otherwise(0L)).as("y"))
      .withColumn("d", col("y") - col("x"))
    val g = perUser.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_c"),
      sum(when(col("arm") === 0, col("d")).otherwise(0L)).as("sd_c"),
      sum(when(col("arm") === 0, col("d") * col("d")).otherwise(0L)).as("sdd_c"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_t"),
      sum(when(col("arm") === 1, col("d")).otherwise(0L)).as("sd_t"),
      sum(when(col("arm") === 1, col("d") * col("d")).otherwise(0L)).as("sdd_t"))
    def dd(c: String) = col(c).cast("double")
    // dollars; every chain left-assoc, mirrored verbatim in the oracle
    val meanC = dd("sd_c") / dd("n_c") / lit(100.0)
    val meanT = dd("sd_t") / dd("n_t") / lit(100.0)
    val did = meanT - meanC
    val varC = (dd("sdd_c") - dd("sd_c") * dd("sd_c") / dd("n_c")) /
      (dd("n_c") - lit(1.0)) / lit(10000.0)
    val varT = (dd("sdd_t") - dd("sd_t") * dd("sd_t") / dd("n_t")) /
      (dd("n_t") - lit(1.0)) / lit(10000.0)
    val se2 = varT / dd("n_t") + varC / dd("n_c")
    val okMean = col("n_c") > 0 && col("n_t") > 0
    val ok = col("n_c") > 1 && col("n_t") > 1 && se2 > lit(0.0)
    g.select(col("n_c"), col("n_t"),
      col("sd_c").as("sum_d_c_cents"), col("sd_t").as("sum_d_t_cents"),
      when(okMean, round(did * 1e6).cast("long")).otherwise(lit(null))
        .as("did_e6"),
      when(ok, round(did * did / se2 * 1e6).cast("long")).otherwise(lit(null))
        .as("t2_e6"))
  }

  /** Exponentially-weighted moving average of the daily revenue series —
    * the classic smoothing next to [[seasonalNaive]]'s forecast, kept
    * EXACT: with α = 1/2 the recursion `s_d = (cents_d + s_{d−1}) div 2`
    * (seeded at the first day) is pure integer arithmetic, so both engines
    * agree bit-for-bit — no float decay factor ever appears. One row per
    * observed day: the raw cents and the smoothed cents.
    *
    * The recursion is inherently sequential, but the series is DAY-bounded
    * by contract (|days| rows after the daily rollup — the corpus never
    * reaches it), so it folds as one sorted array on a single row: the
    * km_seed_next bounded-relation discipline. The corpus-scale work is
    * the map-side-combined daily groupBy. The halving step is written as a
    * FLOOR division (`(v − 1) div 2` on negative v — Spark's `div`
    * truncates toward zero, DuckDB's `//` floors; they diverge on negative
    * odd operands), so a negative daily total (refunds in a future fixture)
    * keeps both engines bit-identical instead of silently hash-diverging.
    */
  def ewma(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    daily.agg(sort_array(collect_list(struct(col("d"), col("cents")))).as("a"))
      .select(explode(expr(
        "transform(a, (x, i) -> struct(x.d AS d, x.cents AS cents, " +
          "aggregate(slice(a, 2, i), element_at(a, 1).cents, " +
          "(s, y) -> if(y.cents + s >= 0, (y.cents + s) div 2, " +
          "(y.cents + s - 1) div 2)) AS ewma_cents))")).as("r"))
      .select(col("r.d").as("d"), col("r.cents").as("cents"),
        col("r.ewma_cents").as("ewma_cents"))
  }

  /** Peak concurrent sessions per day — the capacity-planning census: how
    * many sessions were simultaneously open at the day's busiest instant.
    * Classic sweep line: each [[sessionize]] session contributes +1 at its
    * start and −1 one microsecond after its end; concurrency at any point
    * is the running sum of deltas.
    *
    * Scale shape: the sweep is TWO-LEVEL, never one global window. Deltas
    * aggregate per distinct timestamp (one shuffle), the running prefix is
    * computed WITHIN each day (partitioned window), and a day-level base —
    * the number of sessions still open at each midnight — comes from a
    * running sum over the per-day totals (a day-count-bounded relation, the
    * km_seed_next single-partition-window discipline). Peak(d) =
    * base(d) + max(0, max intra-day prefix): the max(0,·) keeps a day whose
    * only points are session ENDS from reporting less than its midnight
    * carry-in.
    */
  def concurrency(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val dayUs = 86400000000L
    val sess = sessionize(events, gapMinutes)
    val deltas = sess.select(col("start_us").as("us"), lit(1L).as("delta"))
      .unionAll(sess.select((col("start_us") + col("dur_us") + 1).as("us"),
        lit(-1L).as("delta")))
    val pts = deltas.groupBy("us")
      .agg(sum("delta").as("delta"),
        sum(when(col("delta") > 0, 1L).otherwise(0L)).as("plus"),
        sum(when(col("delta") < 0, 1L).otherwise(0L)).as("minus"))
      .withColumn("day", expr(s"us div $dayUs"))
    val intra = Window.partitionBy("day").orderBy("us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = pts
      .withColumn("pre", sum("delta").over(intra))
      .groupBy("day")
      .agg(sum("delta").as("tot"), max("pre").as("maxpre"),
        sum("plus").as("n_start"), sum("minus").as("n_end"))
    val days = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("base", coalesce(sum("tot").over(days), lit(0L)))
      .select(col("day"), col("base"),
        (col("base") + greatest(col("maxpre"), lit(0L))).as("peak"),
        col("n_start"), col("n_end"))
  }

  /** Time-weighted average value per (user, day) — the TWAP/state-duration
    * aggregate: each event's value holds from its timestamp until the
    * user's next event, clamped to the day boundary, and the day's average
    * weighs each value by how long it held. The honest summary when events
    * arrive irregularly (a plain avg over-counts bursts); the same shape
    * prices time-in-state for billing.
    *
    * Exact arithmetic end-to-end: weights are integer microseconds, values
    * integer cents, and the average is one integer division
    * `Σ(cents·weight) div Σweight` — hash-stable across engines. The total
    * weight is ≥ 1 by construction (an event's own-day weight is at least
    * 1 µs unless another event shares its exact timestamp, and the LAST
    * event of a (user, day) always reaches the day boundary), so the
    * division never sees zero. ONE shuffle on user_id for the lead window,
    * then a (user, day) aggregate on the already-clustered rows.
    */
  def twap(events: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .withColumn("day", expr(s"us div $dayUs"))
      .withColumn("next_us", lead("us", 1).over(w))
      .withColumn("weight",
        least(coalesce(col("next_us"), lit(Long.MaxValue)),
          (col("day") + 1) * lit(dayUs)) - col("us"))
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_events"),
        sum("weight").as("weight_us"),
        expr("sum(cents * weight) div sum(weight)").as("twap_cents"))
  }

  /** Mann–Whitney U rank-sum test between two event types' value
    * distributions — the distribution-free companion to [[abTest]]'s
    * two-proportion z: does `armA` spend stochastically dominate `armB`,
    * without assuming normality (the honest test for heavy-tailed revenue).
    *
    * Exact-integer discipline: ranks are computed over the GROUPED value
    * domain (one row per distinct cent value with per-arm counts), and all
    * rank sums use DOUBLED ranks so midranks for ties stay integral:
    * a value with `cl` cheaper observations and `ce` ties has
    * 2·midrank = 2·cl + ce + 1, so r2_a = Σ na_c·(2cl+ce+1) and
    * 2U_a = r2_a − na(na+1) are exact int64; the tie-corrected normal
    * z-score is then one fixed double formula over those integers (the
    * q_corr determinism recipe). Scale: the ordered prefix runs over the
    * distinct-VALUE relation, bounded by the cent domain (≤ ~56k rows here
    * regardless of event count), not by n.
    */
  def mannWhitney(events: DataFrame, armA: String = "click",
      armB: String = "view"): DataFrame = {
    val byVal = events.filter(col("event_type").isin(armA, armB))
      .groupBy(round(col("value") * 100).cast("long").as("cents"))
      .agg(sum(when(col("event_type") === armA, 1L).otherwise(0L)).as("na_c"),
        sum(when(col("event_type") === armB, 1L).otherwise(0L)).as("nb_c"))
    val w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    val g = byVal
      .withColumn("cl", coalesce(sum(col("na_c") + col("nb_c")).over(w), lit(0L)))
      .withColumn("ce", col("na_c") + col("nb_c"))
      .agg(sum("na_c").as("na"), sum("nb_c").as("nb"),
        sum(col("na_c") * (col("cl") * 2 + col("ce") + 1)).as("r2_a"),
        sum(col("ce") * col("ce") * col("ce") - col("ce")).as("tie3"))
    def d(c: String) = col(c).cast("double")
    val u2a = col("r2_a") - col("na") * (col("na") + 1)
    val n = col("na") + col("nb")
    val mu2 = d("na") * d("nb") // 2·E[U] = na·nb
    val varU = d("na") * d("nb") / 12.0 *
      ((n.cast("double") + 1.0) - d("tie3") / (n.cast("double") * (n.cast("double") - 1.0)))
    g.select(col("na"), col("nb"), u2a.as("u2_a"),
      (col("na") * col("nb") * 2 - u2a).as("u2_b"), col("tie3"),
      when(varU > 0,
        round((u2a.cast("double") - mu2) / (lit(2.0) * sqrt(varU)) * 1e6)
          .cast("long")).as("z_e6"))
  }

  /** Kaplan–Meier survival input table over user lifetimes — the churn
    * census: for each day, how many users were active-and-at-risk, how many
    * churned (their LAST event, outside the right-censoring guard), how
    * many left censored, and the discrete hazard in exact ppm. The
    * (n_risk, n_churn) pairs are exactly the KM estimator's per-interval
    * factors; censoring uses the standard observation-window rule — a user
    * whose last event falls within `censorDays` of the corpus end may
    * simply not have returned YET, so their exit counts as censored, not
    * churned.
    *
    * Scale: one groupBy(user) reduces the corpus to per-user
    * (first_day, last_day); everything after runs on the day-count-bounded
    * relation (running sums over per-day start/end totals — no
    * user × calendar explode, no generate_series spine).
    */
  def survival(events: DataFrame, censorDays: Int = 7): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val users = events.groupBy("user_id")
      .agg(min(day).as("first_day"), max(day).as("last_day"))
    // the censoring cutoff is ONE scalar — collect it (a plain scan + max,
    // no shuffle) and inline as a literal rather than carrying it through a
    // 1-row broadcast join; keeps the no-nested-loop plan gate strict.
    // CONSTRUCTION-EAGER by consequence: building the survival plan runs
    // this one scan job even if the result is never materialized (recorded
    // next to PlansSpec's eager notes; callers timing plan construction
    // should know the horizon scan bills here)
    val maxDayRow = events.agg(max(day)).head()
    if (maxDayRow.isNullAt(0))
      return users.limit(0).select(lit(0L).as("day"), lit(0L).as("n_risk"),
        lit(0L).as("n_churn"), lit(0L).as("n_censored"),
        lit(0L).as("hazard_ppm"))
    val maxDay = maxDayRow.getLong(0)
    val perDay = users
      .withColumn("churned",
        (col("last_day") <= lit(maxDay) - censorDays).cast("long"))
      .select(explode(array(
        struct(col("first_day").as("day"), lit(1L).as("enter"),
          lit(0L).as("churn"), lit(0L).as("cens")),
        struct(col("last_day").as("day"), lit(0L).as("enter"),
          col("churned").as("churn"), (lit(1L) - col("churned")).as("cens"))))
        .as("x"))
      .groupBy(col("x.day").as("day"))
      .agg(sum("x.enter").as("enters"), sum("x.churn").as("n_churn"),
        sum("x.cens").as("n_censored"))
    val upTo = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    perDay
      .withColumn("n_risk",
        sum("enters").over(upTo) -
          coalesce(sum(col("n_churn") + col("n_censored")).over(before), lit(0L)))
      .select(col("day"), col("n_risk"), col("n_churn"), col("n_censored"),
        expr("n_churn * 1000000 div n_risk").as("hazard_ppm"))
  }

  /** Per-user linear spend trend — the LTV-slope feature: ordinary least
    * squares over the user's (day, daily cents) series, reported as
    * cents/day in e6 fixed point. Sufficient statistics (n, Σx, Σy, Σxy,
    * Σx²) are exact int64 sums over integer days and cents; the slope is
    * one fixed double formula over them (the q_corr recipe), so the oracle
    * is hash-exact. Users need ≥ `minDays` distinct active days and a
    * non-degenerate x spread. One shuffle to the daily grain, one more to
    * the user grain — both standard partial-agg shapes.
    */
  def trend(events: DataFrame, minDays: Int = 5): DataFrame = {
    val day = expr("unix_micros(ts) div 86400000000")
    val daily = events.groupBy(col("user_id"), day.as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val g = daily.groupBy("user_id").agg(
      count(lit(1)).as("n_days"),
      sum("day").as("sx"), sum("cents").as("sy"),
      sum(col("day") * col("cents")).as("sxy"),
      sum(col("day") * col("day")).as("sxx"))
    def d(c: String) = col(c).cast("double")
    val num = d("n_days") * d("sxy") - d("sx") * d("sy")
    val den = d("n_days") * d("sxx") - d("sx") * d("sx")
    g.filter(col("n_days") >= minDays && den > 0)
      .select(col("user_id"), col("n_days"), col("sy").as("sum_cents"),
        round(num / den * 1e6).cast("long").as("slope_e6"))
  }

  /** Lag-k autocorrelation of the daily revenue series, k = 1..maxLag —
    * the seasonality-strength diagnostic next to [[seasonality]] (is there
    * a weekly echo? does yesterday predict today?) that decides whether a
    * forecast needs seasonal terms. One scan reduces events to the daily
    * cents series (|days| rows — WEEKS, not events); each lag is then an
    * equi-join of that tiny series against itself shifted by k, and the
    * Pearson r per lag follows the [[trend]] exactness recipe: integer
    * sufficient statistics, one fixed double formula. Pairs exist only
    * where both days have revenue (both engines drop the same holes).
    */
  def autocorr(events: DataFrame, revenueType: String = "purchase",
      maxLag: Int = 7): DataFrame = {
    val daily = events.filter(col("event_type") === revenueType)
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val pairs = daily
      .withColumn("lag", explode(sequence(lit(1L), lit(maxLag.toLong))))
      .withColumn("day2", col("day") + col("lag"))
      .join(daily.select(col("day").as("day2"), col("cents").as("cents2")),
        "day2")
    val g = pairs.groupBy("lag").agg(
      count(lit(1)).as("n_pairs"),
      sum("cents").as("sx"), sum("cents2").as("sy"),
      sum(col("cents") * col("cents")).as("sxx"),
      sum(col("cents2") * col("cents2")).as("syy"),
      sum(col("cents") * col("cents2")).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val num = d("n_pairs") * d("sxy") - d("sx") * d("sy")
    val den = sqrt((d("n_pairs") * d("sxx") - d("sx") * d("sx")) *
      (d("n_pairs") * d("syy") - d("sy") * d("sy")))
    g.select(col("lag"), col("n_pairs"),
      when(den > 0, round(num / den * 1e6).cast("long")).as("r_e6"))
  }

  /** Bot/abuse census — the machine-traffic filter a training-data
    * pipeline runs before user-behavior features are trusted: per user,
    * event count, active span, events-per-active-hour rate, and the
    * sub-second inter-event gap share (human actions don't arrive 10/s for
    * hours). All exact integers: gaps from one lag window over the
    * single-shuffle-per-user ordering every events op shares, rate and
    * share in fixed-point via `div`. The flag is a policy row — consumers
    * read the stats, the threshold is just a sensible default.
    */
  def botDetect(events: DataFrame, minEvents: Int = 20,
      fastGapUs: Long = 1000000L, maxPerHourX100: Long = 120000L): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gaps = events
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag("us", 1).over(w))
    val g = gaps.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      (max("us") - min("us")).as("span_us"),
      sum(when(col("gap_us") < fastGapUs, 1L).otherwise(0L)).as("n_fast"),
      min("gap_us").as("min_gap_us"))
    g.select(col("user_id"), col("n_events"), col("span_us"),
        col("n_fast"), coalesce(col("min_gap_us"), lit(-1L)).as("min_gap_us"),
        when(col("span_us") > 0,
          expr("n_events * 360000000000 div span_us"))
          .otherwise(lit(0L)).as("per_hour_x100"),
        when(col("n_events") > 1,
          expr("n_fast * 1000000 div (n_events - 1)"))
          .otherwise(lit(0L)).as("fast_share_ppm"))
      .withColumn("is_bot",
        (col("n_events") >= minEvents &&
          (col("per_hour_x100") > maxPerHourX100 ||
            col("fast_share_ppm") > 500000L)).cast("long"))
  }

  /** FORWARD as-of join — [[asofJoin]]'s time-mirror: for every `leftType`
    * event, the timestamp of the EARLIEST `rightType` event by the same
    * user at or after it (click → next purchase: the conversion-delay
    * primitive funnels build on). Same scale shape — tag, UNION, one
    * window per user — but the carry runs BACKWARD: `first(ignoreNulls)`
    * over the frame from the current row to the partition end. Right rows
    * sort AFTER left rows at equal timestamps via the tag so a same-instant
    * right event still matches (`r.ts >= l.ts` inclusive), mirroring the
    * backward form's inclusivity.
    */
  def asofJoinForward(events: DataFrame, leftType: String = "click",
      rightType: String = "purchase"): DataFrame = {
    val us = unix_micros(col("ts"))
    val lRows = events.filter(col("event_type") === leftType)
      .select(col("user_id"), us.as("us"), col("event_id").as("oid"),
        lit(0).as("tag"), lit(null).cast("long").as("r_us"))
    val rRows = events.filter(col("event_type") === rightType)
      .select(col("user_id"), us.as("us"), col("event_id").as("oid"),
        lit(1).as("tag"), us.as("r_us"))
    val w = Window.partitionBy("user_id").orderBy("us", "tag", "oid")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lRows.unionAll(rRows)
      .withColumn("asof_us", first("r_us", ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("oid").as("event_id"), col("user_id"), col("us"),
        col("asof_us"))
  }
}
