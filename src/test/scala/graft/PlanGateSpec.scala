package graft

/** Diffs every query's physical-plan fingerprint against the frozen
  * `plan_gate.json` — see [[PlanGate]] for what is counted and why.
  * A failure here means the PLAN changed, not (necessarily) the
  * rows: if the change is intentional, regenerate the baseline with
  * `graft.PlanGate` and review the JSON diff; if not, you just
  * caught a silent shuffle/join-strategy regression before it cost a
  * cluster run.
  */
class PlanGateSpec extends SparkSpec {

  private lazy val gated = PlanGate.session(spark)

  private lazy val expected: Map[String, Map[String, Int]] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(PlanGate.resourcePath))
    val b = Map.newBuilder[String, Map[String, Int]]
    root.fields().forEachRemaining { e =>
      val fp = Map.newBuilder[String, Int]
      e.getValue.fields().forEachRemaining(f => fp += f.getKey -> f.getValue.asInt)
      b += e.getKey -> fp.result()
    }
    b.result()
  }

  test("the frozen baseline covers exactly the registered queries") {
    assert(expected.keySet === SparkEntry.queries.keySet,
      "query set changed: regenerate plan_gate.json (graft.PlanGate) and review the diff")
  }

  // One test per query so a drift reads as the query's name, not a
  // 138-line aggregate assertion.
  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"plan fingerprint: $name") {
      val got = PlanGate.fingerprint(
        SparkEntry.queries(name)(gated, PlanGate.defaultSf))
      assert(got === expected(name),
        s"plan shape drifted for $name — intentional? regenerate with graft.PlanGate")
    }
  }
}
