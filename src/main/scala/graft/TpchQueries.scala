package graft

/** TPC-H-shaped SQL corpus, adapted to the driver testdata schema
  * (TESTDATA.md; no `partsupp` table, reduced column set — each query's
  * scaladoc notes its adaptation). The reference executes only Q1–Q6 of its
  * corpus (reference: xorbits_sql/tests/test_tpc_h.py:57); we target all 22
  * shapes (SURVEY.md §5.4).
  *
  * == Oracle bit-exactness ==
  * The driver hash-compares our parquet output against DuckDB running the
  * oracle SQL. Doubles summed in different orders are NOT bit-exact across
  * engines, so every money/avg aggregate uses exact integer arithmetic:
  * `FLOOR(x * 100)` is computed identically (IEEE double ops) in both
  * engines, summed exactly as BIGINT, and divided back at the end — one
  * deterministic double op on identical operands. Variance/stddev use the
  * exact-moment formula over BIGINT sums for the same reason.
  */
object TpchQueries {

  /** A named query: Spark SQL text + DuckDB oracle text (usually identical —
    * authoring one text for both engines is itself the compat check).
    */
  final case class Q(name: String, spark: String, oracle: Option[String])

  private def same(name: String, sql: String): Q = Q(name, sql, Some(sql))

  /** Exact money sum: SUM of cents as BIGINT, back to double at the end. */
  def money(expr: String, alias: String): String =
    s"CAST(SUM(CAST(FLOOR(($expr) * 100) AS BIGINT)) AS DOUBLE) / 100 AS $alias"

  /** Exact 4-decimal average (NULL-free inputs; uses COUNT(*)). */
  def avg4(expr: String, alias: String): String =
    s"CAST(SUM(CAST(FLOOR(($expr) * 10000) AS BIGINT)) AS DOUBLE) / 10000 / COUNT(*) AS $alias"

  /** Q1 pricing summary — scan→filter→group-agg→sort; the reference's
    * flagship tested query (tests/tpc-h/tpc-h.sql:4-24). Full column set
    * available in testdata.
    */
  val q1: Q = same("q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  ${money("l_quantity", "sum_qty")},
       |  ${money("l_extendedprice", "sum_base_price")},
       |  ${money("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
       |  ${money("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
       |  ${avg4("l_quantity", "avg_qty")},
       |  ${avg4("l_extendedprice", "avg_price")},
       |  ${avg4("l_discount", "avg_disc")},
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin)

  val all: Seq[Q] = Seq(q1)
}
