package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Round-record adjudicator — the final step of `tools/gate.sh` (r17
  * verdict stretch task 8: one command from source to a cool-labeled,
  * protocol-checked round record instead of a recipe scattered across
  * tools/ and docs).
  *
  * Usage: `Gate <official-record.json> [quiet-record.json]`
  *
  * Checks, each printed as PASS/FAIL with the evidence inline:
  *  1. ERRORS — the official record ran every query clean (`n_errors` 0).
  *  2. COOL — the official record's quiesce gates were MET (`cool` true;
  *     under the r18 protocol that means load ≤ 2 and probe ≤ 1.3× the
  *     committed reference at start). A hot record is self-labeled and
  *     must not be committed as the round record.
  *  3. FLOORS — every query in the record has a pinned floor in
  *     BASELINE_BENCH.json and vice versa (the r17 blindness class).
  *  4. OVER-2X — the enforceable bar (`over_2x`: ratio > 2 AND past the
  *     floor-scaled excess bar) is empty.
  *  5. QUIET-LEG — with a second record (the reversed-order leg), every
  *     over-2×-by-RATIO official entry must read ≤ 1.9× there
  *     ([[Bench.quietLegViolations]]) — environmental drift is laundered
  *     by evidence, real regressions fail the gate.
  * Exit code: number of failed checks.
  */
object Gate {
  private def queries(rec: JsonNode): Map[String, Double] = {
    val q = rec.get("queries")
    val out = scala.collection.mutable.Map.empty[String, Double]
    val it = q.fieldNames()
    while (it.hasNext) { val k = it.next(); out(k) = q.get(k).asDouble() }
    out.toMap
  }

  /** Fail with a usage error — not a bare NPE — when handed something
    * that is not a full bench record (e.g. BASELINE_BENCH.json itself,
    * the other JSON in the repo root, or a truncated partial record).
    */
  private def requireRecord(rec: JsonNode, path: String): Unit =
    require(Seq("queries", "n_errors", "cool", "value").forall(rec.has),
      s"$path is not a full bench record (expected the bench_full.json " +
        "shape with queries/n_errors/cool/value)")

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Gate <official-record.json> [quiet-record.json]")
    val om = new ObjectMapper()
    val official = om.readTree(new java.io.File(args(0)))
    requireRecord(official, args(0))
    val quiet = args.lift(1).map { p =>
      val rec = om.readTree(new java.io.File(p))
      requireRecord(rec, p)
      rec
    }
    // same loader the bench itself uses — one copy of the resolution+parse
    val floors = Bench.loadBaseline()
    require(floors.nonEmpty, "BASELINE_BENCH.json not found or empty")
    val offQ = queries(official)
    var failed = 0
    def check(name: String, ok: Boolean, detail: String): Unit = {
      if (!ok) failed += 1
      println(f"[gate] ${if (ok) "PASS" else "FAIL"}%s  $name%-9s $detail")
    }

    val nErr = official.get("n_errors").asInt()
    check("ERRORS", nErr == 0, s"n_errors=$nErr")

    val cool = official.get("cool").asBoolean()
    check("COOL", cool,
      s"cool=$cool load=${official.get("load_avg")} probe_ms=${official.get("probe_ms")}")

    val noFloor = (offQ.keySet -- floors.keySet).toSeq.sorted
    val noQuery = (floors.keySet -- offQ.keySet).toSeq.sorted
    check("FLOORS", noFloor.isEmpty && noQuery.isEmpty,
      s"${offQ.size} queries vs ${floors.size} floors" +
        (if (noFloor.nonEmpty) s"; floorless: $noFloor" else "") +
        (if (noQuery.nonEmpty) s"; floor-only: $noQuery" else ""))

    val over = Option(official.get("over_2x"))
      .map(n => (0 until n.size()).map(n.get(_).asText())).getOrElse(Nil)
    check("OVER-2X", over.isEmpty,
      if (over.isEmpty) "enforceable bar clean" else s"breaches: $over")

    quiet match {
      case Some(qRec) =>
        val qCool = qRec.get("cool").asBoolean()
        val viol = Bench.quietLegViolations(offQ, queries(qRec), floors)
        check("QUIET-LEG", viol.isEmpty && qCool,
          s"quiet cool=$qCool" + (if (viol.nonEmpty)
            s"; over-2x-ratio NOT laundered by the quiet leg: $viol"
          else "; all official over-2x-ratio entries clear 1.9x quiet"))
      case None =>
        println("[gate] SKIP  QUIET-LEG no quiet record supplied " +
          "(pass the reversed-order bench_full.json as arg 2)")
    }

    val total = official.get("value").asDouble()
    // keysIterator, NOT keys: a Set's flatMap dedupes equal floor VALUES
    // before the sum (caught r18 — it under-reported the floor sum 201.8
    // → 187.1 and overstated the aggregate ratio)
    val floorSum = offQ.keysIterator.flatMap(floors.get).sum
    println(f"[gate] total ${total}%.1f s vs floor sum ${floorSum}%.1f s = " +
      f"${total / floorSum}%.2fx aggregate")
    println(s"[gate] ${if (failed == 0) "ALL CHECKS PASS" else s"$failed CHECK(S) FAILED"}")
    if (failed > 0) sys.exit(failed)
  }
}
