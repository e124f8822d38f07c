package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's run-order CLUSTER rerun trigger — the gate added after
  * round 13's blind spot, where six consecutive `events_a*` queries at
  * 4-8× their sub-0.5 s floors all slid under the absolute-excess bars and
  * got zero reruns. Pure-function tests; no Spark session.
  */
class BenchGateSpec extends AnyFunSuite {
  private val noErrors: String => Boolean = _ => false

  test("round-13 scenario: an adjacent over-2x stretch is flagged despite tiny excesses") {
    // floors ~0.3 s, walls 4-8x but excess < 2 s — the exact shape the
    // per-query bars exempt; the cluster trigger must catch all of them
    val floors = Map("events_asof" -> 0.337, "events_asof_bcast" -> 0.234,
      "events_asof_fwd" -> 0.317, "events_asof_native" -> 0.298,
      "events_asof_tol" -> 0.257, "events_attribution_position" -> 0.266,
      "events_concurrency" -> 1.6, "events_trend" -> 0.42)
    val walls = Seq(
      "events_asof" -> 1.728, "events_asof_bcast" -> 1.433,
      "events_asof_fwd" -> 2.238, "events_asof_native" -> 1.370,
      "events_asof_tol" -> 1.340, "events_attribution_position" -> 2.083,
      "events_concurrency" -> 1.712, // within floor — must NOT be flagged
      "events_trend" -> 0.9)         // 2.1x of 0.42
    val got = Bench.clusterFlaggedNames(walls, floors, noErrors)
    assert(got.toSet == Set("events_asof", "events_asof_bcast",
      "events_asof_fwd", "events_asof_native", "events_asof_tol",
      "events_attribution_position", "events_trend"), got)
  }

  test("isolated over-2x entries do not trip the cluster trigger") {
    val floors = Map("a" -> 0.3, "m" -> 0.3, "z" -> 0.3)
    // two over-2x queries 10 positions apart: no window of 8 holds 3
    val walls = Seq("a" -> 1.0) ++ (1 to 9).map(i => s"ok$i" -> 0.1) ++
      Seq("m" -> 1.0) ++ (1 to 9).map(i => s"kk$i" -> 0.1) ++ Seq("z" -> 1.0)
    assert(Bench.clusterFlaggedNames(walls, floors, noErrors).isEmpty)
  }

  test("three over-2x within a window of 8 flag; errored and floorless entries never count") {
    val floors = Map("a" -> 0.3, "b" -> 0.3, "c" -> 0.3, "d" -> 0.3)
    val walls = Seq("a" -> 1.0, "x" -> 0.1, "b" -> 1.0, "nofloor" -> 9.0,
      "c" -> 1.0, "d" -> 1.0)
    // all four floored entries sit within 8 positions → all flagged;
    // "nofloor" has no baseline and never participates
    assert(Bench.clusterFlaggedNames(walls, floors, noErrors).toSet ==
      Set("a", "b", "c", "d"))
    // with b and c errored, only a and d remain over-2x — a pair, no cluster
    val errored = Set("b", "c")
    assert(Bench.clusterFlaggedNames(walls, floors, errored).isEmpty)
  }

  test("every declared query has a pinned bench floor (r17 task 1: the " +
      "over-2x gate must never be blind to new work)") {
    // r17 shipped three queries without floors; the over-2×-floor gate,
    // the anomaly-rerun trigger and vs_baseline were all blind to them.
    // This assertion makes the blindness class unrepresentable: declaring
    // a query without pinning its floor (gated quiet protocol, min of N
    // runs — see BASELINE_BENCH.json note) now fails the suite.
    // the bench's own loaders — the spec must read the same floors the
    // gate reads, through the same resolution
    val floors = Bench.loadBaseline().keySet
    val missing = SparkEntry.queries.keySet -- floors
    assert(missing.isEmpty,
      s"declared queries without a pinned floor: ${missing.toSeq.sorted}")
    // symmetric: a renamed/deleted query must not leave a stale floor (the
    // r18 mm_phash_capped -> mm_phash_exact rename is exactly this class)
    val stale = floors -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"pinned floors without a declared query: ${stale.toSeq.sorted}")
    // and the probe reference travels with the floors (r17 advice: no
    // hard-coded per-host constant as the only source)
    assert(Bench.baselineProbeRefMs().exists(_ > 0))
  }

  test("quietLegViolations: official over-2x-ratio entries are noise iff " +
      "the quiet leg clears them (r17 task 7 protocol, encoded)") {
    val floors = Map("a" -> 0.4, "b" -> 0.5, "c" -> 1.0, "d" -> 0.3)
    val official = Map(
      "a" -> 0.92,  // 2.3x officially
      "b" -> 1.15,  // 2.3x officially
      "c" -> 1.5,   // 1.5x — not over, never a violation
      "d" -> 0.9)   // 3.0x officially, missing from the quiet leg
    val quiet = Map(
      "a" -> 0.6,   // 1.5x quiet → laundered (environmental)
      "b" -> 1.05,  // 2.1x quiet → STILL over the 1.9 bar → real
      "c" -> 2.6)   // quiet reading irrelevant — official was clean
    val got = Bench.quietLegViolations(official, quiet, floors)
    assert(got == Seq("b", "d"), got)
    // boundary: exactly at the quiet bar clears
    assert(Bench.quietLegViolations(Map("a" -> 0.92),
      Map("a" -> 0.4 * 1.9), floors).isEmpty)
    // floorless names never participate
    assert(Bench.quietLegViolations(Map("x" -> 99.0), Map.empty, floors).isEmpty)
  }

  test("window boundary: positions exactly window-1 apart still cluster; window apart do not") {
    val floors = Map("p" -> 0.3, "q" -> 0.3, "r" -> 0.3)
    def walls(gap: Int) = Seq("p" -> 1.0) ++
      (1 until gap).map(i => s"f$i" -> 0.1) ++ Seq("q" -> 1.0) ++
      (1 until gap).map(i => s"g$i" -> 0.1) ++ Seq("r" -> 1.0)
    // gap 7: p at 0, q at 7, r at 14 — |p−q| = 7 ≤ 7 and |q−r| = 7: q sees
    // three members (p, q, r are each within 7 of q) → all three flag via
    // q's window… but p only sees q, r only sees q. Per-member counting:
    // p counts {p, q} = 2 → p not flagged; q counts {p, q, r} = 3 → flagged.
    val got7 = Bench.clusterFlaggedNames(walls(7), floors, noErrors)
    assert(got7 == Seq("q"), got7)
    // gap 8: no member sees more than 2 → nothing flags
    assert(Bench.clusterFlaggedNames(walls(8), floors, noErrors).isEmpty)
  }
}
