package graft

import org.apache.spark.sql.functions._
import graft.operators.Events
import graft.plans.AsofJoinExec

/** The native as-of join operator (custom logical node + strategy +
  * merge-scan exec) against the compositional union+window form.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val events = Seq(
    // user 1: purchase before, between, and exactly at a click
    (1L, 10L, "purchase", "2024-01-01 10:00:00"),
    (2L, 10L, "click", "2024-01-01 10:05:00"),
    (3L, 10L, "purchase", "2024-01-01 10:10:00"),
    (4L, 10L, "click", "2024-01-01 10:10:00"), // same instant: must match
    (5L, 10L, "click", "2024-01-01 10:20:00"),
    // user 2: click with NO prior purchase, then one after
    (6L, 20L, "click", "2024-01-01 09:00:00"),
    (7L, 20L, "purchase", "2024-01-01 09:30:00"),
    (8L, 20L, "click", "2024-01-01 09:45:00"),
    // user 3: purchases only (no left rows)
    (9L, 30L, "purchase", "2024-01-01 08:00:00")
  ).map { case (e, u, t, s) => (e, u, t, ts(s)) }
    .toDF("event_id", "user_id", "event_type", "ts")

  test("tolerance form nulls stale matches, keeps fresh ones with their age") {
    // tol = 10 min: click 2 (5 min after purchase 1) stays matched;
    // click 5 (10 min after purchase 3) is exactly at the bound — kept;
    // click 8 (15 min after purchase 7) goes stale -> null
    val got = graft.operators.Events
      .asofJoinTolerance(events, tolMinutes = 10)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    def us(s: String) = ts(s).getTime * 1000L
    assert(got(2L) == (us("2024-01-01 10:00:00"), 300000000L))
    assert(got(4L) == (us("2024-01-01 10:10:00"), 0L))
    assert(got(5L) == (us("2024-01-01 10:10:00"), 600000000L))
    assert(got(6L) == (-1L, -1L)) // no prior purchase at all
    assert(got(8L) == (-1L, -1L)) // match exists but stale
  }

  test("tolerance projection serves the native exec identically") {
    val composed = Events.asofJoinTolerance(events, tolMinutes = 10)
      .orderBy("event_id").collect().toSeq
    val native = Events.asofJoinTolerance(events, tolMinutes = 10, native = true)
      .orderBy("event_id").collect().toSeq
    assert(native == composed)
    val s = Events.asofJoinTolerance(events, tolMinutes = 10, native = true)
      .queryExecution.executedPlan.toString
    assert(s.contains("AsofJoin") && !s.contains("Window"), s"plan was:\n$s")
  }

  test("native as-of matches the hand-derivable fixture exactly (both physical forms)") {
    def us(s: String) = ts(s).getTime * 1000L
    for (b <- Seq(Some(false), Some(true))) {
      val got = Events.asofJoinNative(events, broadcast = b)
        .as[(Long, Long, Long, Option[Long])].collect()
        .map(r => r._1 -> r._4).toMap
      assert(got == Map(
        2L -> Some(us("2024-01-01 10:00:00")),
        4L -> Some(us("2024-01-01 10:10:00")), // same-instant purchase matches
        5L -> Some(us("2024-01-01 10:10:00")),
        6L -> None, // no prior purchase
        8L -> Some(us("2024-01-01 09:30:00"))), s"broadcast=$b")
    }
  }

  test("native and compositional forms agree row-for-row on the sf0.001 events") {
    val ev = Tables.readEvents(spark, sf("0.001"))
    val native = Events.asofJoinNative(ev)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    val window = Events.asofJoin(ev)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(native.length == window.length && native.sameElements(window))
  }

  test("the plan is the custom exec: one exchange per side, no window, no union") {
    val df = Events.asofJoinNative(Tables.readEvents(spark, sf("0.001")),
      broadcast = Some(false))
    val plan = df.queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("AsofJoin"), s"plan was:\n$s")
    assert(!s.contains("Window") && !s.contains("Union"), s"plan was:\n$s")
    assert("Exchange".r.findAllIn(s).size == 2, s"plan was:\n$s")
  }

  test("survives a skewed pre-partitioning of the inputs") {
    // repartition the source badly; EnsureRequirements must still co-cluster
    val got = Events.asofJoinNative(events.repartition(7, col("event_type")),
        broadcast = Some(false))
      .filter(col("event_id") === 5L)
      .select("asof_us").as[Option[Long]].head()
    assert(got.contains(ts("2024-01-01 10:10:00").getTime * 1000L))
  }

  test("broadcast form agrees row-for-row and never shuffles the left side") {
    val ev = Tables.readEvents(spark, sf("0.001"))
    val bcast = Events.asofJoinNative(ev, broadcast = Some(true))
    val got = bcast.as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    val want = Events.asofJoin(ev)
      .as[(Long, Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(got.sameElements(want))
    val s = bcast.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastAsofJoin"), s"plan was:\n$s")
    assert(s.contains("BroadcastExchange"), s"plan was:\n$s")
    assert(!s.contains("ShuffleExchange") && !s.contains("Exchange hashpartitioning"),
      s"plan was:\n$s")
  }

  test("with no hint, stats pick broadcast for a dimension-sized right side") {
    val df = Events.asofJoinNative(Tables.readEvents(spark, sf("0.001")))
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastAsofJoin"), s"plan was:\n$s")
  }

  test("left rows with null key or ts pass through with a null match") {
    val withNulls = events.unionAll(Seq(
      (100L, null.asInstanceOf[java.lang.Long], "click", ts("2024-01-01 12:00:00")),
      (101L, java.lang.Long.valueOf(10L), "click", null.asInstanceOf[java.sql.Timestamp])
    ).toDF("event_id", "user_id", "event_type", "ts"))
    for (b <- Seq(Some(false), Some(true))) {
      val got = Events.asofJoinNative(withNulls, broadcast = b)
        .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
        .map(r => r._1 -> r._4).toMap
      assert(got(100L).isEmpty && got(101L).isEmpty, s"broadcast=$b")
      assert(got(2L).nonEmpty, s"broadcast=$b") // the rest is undisturbed
    }
  }
}
