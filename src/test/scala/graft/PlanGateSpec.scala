package graft

/** The PlanCheck audit as a failing test: the pinned physical-plan
  * invariants (pushdown, broadcast dims, TakeOrderedAndProject top-k, no
  * stray shuffles) must hold on the sf0.001 plans. A regression — a filter
  * that stops pushing, a dim join degrading to sort-merge, a top-k turning
  * into a global sort — fails `sbt test`, not just a human reading the
  * PlanCheck report.
  */
class PlanGateSpec extends SparkSpec {
  test("audited physical plans keep their scale invariants at sf0.001") {
    initLog()
    val violations = PlanCheck.audit(spark, "/root/testdata/sf0.001")
    assert(violations.isEmpty, "\n" + violations.mkString("\n"))
  }

  test("rules only reference real driver queries") {
    val known = SparkEntry.queries.keySet
    val unknown = PlanCheck.rules.map(_.query).filterNot(known)
    assert(unknown.isEmpty, s"rules for unknown queries: $unknown")
  }

  test("no query grows an unpartitioned Window over non-broadcast input") {
    initLog()
    val violations = PlanCheck.windowLint(spark, "/root/testdata/sf0.001")
    assert(violations.isEmpty, "\n" + violations.mkString("\n"))
  }
}
