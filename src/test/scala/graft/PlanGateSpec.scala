package graft

/** The PlanCheck audit as a failing test: the pinned physical-plan
  * invariants (pushdown, broadcast dims, TakeOrderedAndProject top-k, no
  * stray shuffles) must hold on the sf0.001 plans. A regression — a filter
  * that stops pushing, a dim join degrading to sort-merge, a top-k turning
  * into a global sort — fails `sbt test`, not just a human reading the
  * PlanCheck report.
  */
class PlanGateSpec extends SparkSpec {
  // ONE planning pass shared by both gate tests — some gate queries run
  // real work (eager checkpoints, staging) just to build their DataFrame
  private lazy val plans = {
    initLog()
    PlanCheck.planStrings(spark, "/root/testdata/sf0.001")
  }

  test("audited physical plans keep their scale invariants at sf0.001") {
    val violations = PlanCheck.audit(plans)
    assert(violations.isEmpty, "\n" + violations.mkString("\n"))
  }

  test("rules only reference real driver queries") {
    val known = SparkEntry.queries.keySet
    val unknown = PlanCheck.rules.map(_.query).filterNot(known)
    assert(unknown.isEmpty, s"rules for unknown queries: $unknown")
  }

  test("no query grows an unpartitioned Window over non-broadcast input") {
    val violations = PlanCheck.windowLint(plans)
    assert(violations.isEmpty, "\n" + violations.mkString("\n"))
  }
}
