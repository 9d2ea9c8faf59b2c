package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The COUNT(DISTINCT)→HLL++ optimizer rule: off by default, flag-gated,
  * plan actually changes, accuracy within the configured rsd, and
  * filtered/multi-column distincts are left alone.
  */
class ApproxRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def optimizedPlan(sql: String): String = {
    spark.sql(sql).queryExecution.optimizedPlan.toString
  }

  private def withRule[A](enabled: Boolean)(body: => A): A = {
    GraftExtensions.install(spark)
    spark.conf.set(ApproxCountDistinctRule.FlagKey, enabled.toString)
    try body
    finally {
      spark.conf.set(ApproxCountDistinctRule.FlagKey, "false")
      GraftExtensions.uninstall(spark)
    }
  }

  private lazy val orders = {
    initLog()
    val df = graft.Tables.load(spark, "/root/testdata/sf0.01", "orders")
    df.createOrReplaceTempView("orders_ar")
    df
  }

  test("flag off: plan keeps the exact distinct count") {
    orders
    withRule(enabled = false) {
      val p = optimizedPlan("SELECT COUNT(DISTINCT o_custkey) FROM orders_ar")
      assert(p.contains("distinct") || p.contains("DISTINCT"), p)
      assert(!p.contains("hyperloglog") && !p.contains("approx_count_distinct"), p)
    }
  }

  test("flag on: plan rewrites to HLL++ and the estimate lands within rsd") {
    orders
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    withRule(enabled = true) {
      val p = optimizedPlan("SELECT COUNT(DISTINCT o_custkey) FROM orders_ar")
      assert(p.contains("approx_count_distinct") || p.toLowerCase.contains("hyperloglog"), p)
      val approx = spark.sql("SELECT COUNT(DISTINCT o_custkey) FROM orders_ar")
        .head().getLong(0)
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.15, s"approx=$approx exact=$exact err=$err")
    }
  }

  test("flag on: FILTER'd distinct aggregates are left exact") {
    orders
    withRule(enabled = true) {
      val p = optimizedPlan(
        "SELECT COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderkey < 100) FROM orders_ar")
      assert(!p.contains("approx_count_distinct") && !p.toLowerCase.contains("hyperloglog"), p)
    }
  }

  test("flag on: grouped query results stay plausible per group") {
    orders
    val exact = orders.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    withRule(enabled = true) {
      GraftExtensions.install(spark)
      val approx = spark.sql(
        """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n
          |FROM orders_ar GROUP BY o_orderpriority""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      approx.foreach { case (k, v) =>
        val e = exact(k)
        assert(math.abs(v - e).toDouble / e <= 0.15, s"$k: approx=$v exact=$e")
      }
    }
  }
}
