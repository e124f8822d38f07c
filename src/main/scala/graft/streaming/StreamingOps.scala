package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.VectorOps
import graft.operators.KMeans.Centroid

/** Structured-Streaming twins of the batch operators.
  *
  * The reference is purely batch-iterative (SURVEY.md §2.9) — these are the
  * beyond-reference streaming surface: continuous assignment of arriving
  * points to fixed centroids (the natural streaming use of a trained model),
  * watermarked windowed aggregation, and stateful sessionization via
  * `flatMapGroupsWithState`.
  */
object StreamingOps {

  /** Continuous nearest-centroid assignment. Stateless map — the centroid
    * set rides as literals exactly like the batch path, so each micro-batch
    * is a shuffle-free narrow stage.
    */
  def assignStream(points: DataFrame, cs: Seq[Centroid]): DataFrame =
    points.withColumn("j",
      VectorOps.nearestId(col("Y"), cs.map(_.j), cs.map(_.c)))

  /** Streaming exact dedup (twin of `Dedup.exact`/`TextAnalysis.fingerprint`):
    * arriving docs are fingerprinted with the rolling content hash and
    * re-deliveries of an already-seen fingerprint are dropped while its
    * watermark window is open. `dropDuplicatesWithinWatermark` keys state by
    * fingerprint only — state is bounded by (docs per watermark window), not
    * by stream history, which is what makes continuous dedup viable on an
    * unbounded crawl feed.
    */
  def dedupStream(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", aggregate(graft.plans.native.token_ids(col("text")),
        lit(0L), (h, x) => (h * 131 + x) % 1000000007L))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Watermarked tumbling-window counts per event type (streaming twin of
    * `Events.windowAgg`). Late data beyond 10 minutes is dropped; state is
    * bounded by watermark × type cardinality.
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_us"),
        col("event_type"), col("n"), col("sum_value"))

  final case class Ev(user_id: Long, event_id: Long, us: Long)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long)
  final case class SessionOut(user_id: Long, start_us: Long, dur_us: Long, n_events: Long)

  /** Stateful streaming sessionization (streaming twin of
    * `Events.sessionize`): per-user state tracks the open session; a
    * processing-time timeout closes idle sessions and emits them. State is
    * O(active users).
    *
    * `timeoutMs <= 0` disables the idle-timeout (sessions then only close
    * when a later event exceeds the gap) — used by deterministic tests,
    * since processing-time timeouts keep the micro-batch engine scheduling
    * timer batches and `processAllAvailable` never settles.
    */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int = 30,
      timeoutMs: Long = 1000): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val timeoutConf =
      if (timeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              SessionOut(user, s.startUs, s.lastUs - s.startUs, s.n)).toSeq
            state.remove()
            out.iterator
          } else {
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            evs.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
              cur match {
                case Some(s) if e.us - s.lastUs <= gapUs =>
                  cur = Some(s.copy(lastUs = e.us, n = s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(user, s.startUs, s.lastUs - s.startUs, s.n)
                  cur = Some(SessionState(e.us, e.us, 1))
                case None =>
                  cur = Some(SessionState(e.us, e.us, 1))
              }
            }
            cur.foreach(state.update)
            if (timeoutMs > 0) state.setTimeoutDuration(timeoutMs)
            closed.reverse.iterator
          }
      }
  }
}
