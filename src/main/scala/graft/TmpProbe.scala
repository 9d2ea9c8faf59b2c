package graft

import org.apache.spark.sql.SparkSession

/** Temporary syntax probe — deleted before commit. */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false).getOrCreate()
    def p(label: String, sql: String): Unit =
      try {
        val df = spark.sql(sql)
        println(s"PROBE $label OK schema=${df.schema.simpleString} rows=${df.collect().map(_.toString).mkString(";")}")
      } catch { case e: Throwable => println(s"PROBE $label FAIL ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}") }

    p("colon_cast", "SELECT '12'::INT AS x")
    p("try_cast", "SELECT TRY_CAST('abc' AS INT) AS x, TRY_CAST('7' AS INT) AS y")
    p("subscript0", "SELECT array('a','b','c')[1] AS x")
    p("subscript_expr", "SELECT array('a','b','c')[(2)-1] AS x")
    p("is_not_distinct", "SELECT NULL IS NOT DISTINCT FROM NULL AS x, 1 IS NOT DISTINCT FROM 2 AS y")
    p("nullsafe_eq", "SELECT NULL <=> NULL AS x")
    p("length_type", "SELECT length('abc') AS x")
    p("instr_type", "SELECT instr('a-b', '-') AS x")
    p("regexp_like", "SELECT regexp_like('hello', 'ell') AS x, regexp_like('hello', '^ell') AS y")
    p("split_regex", "SELECT split('a.b.c', '\\\\Qa.b\\\\E') AS x")
    p("size_type", "SELECT size(array(1,2)) AS x")
    p("div", "SELECT 7 DIV 2 AS x, CAST(7 AS INT) DIV CAST(2 AS INT) AS y")
    p("date_format", "SELECT date_format(DATE'1996-03-13', 'yyyy-MM') AS x, date_format(DATE'1996-03-13', 'DDD') AS j")
    p("exists_hof", "SELECT exists(array(1,7,3), x -> x = 7) AS x")
    p("sort_array", "SELECT sort_array(array(3,1,2)) AS x")
    p("array_join", "SELECT array_join(array('a','b'), ',') AS x")
    p("any_value", "SELECT any_value(x) FROM VALUES (1),(2) t(x)")
    p("get_json_object", "SELECT get_json_object('{\"a\":{\"b\":3}}', '$.a.b') AS x")
    p("unix_timestamp_ts", "SELECT unix_timestamp(TIMESTAMP'1996-03-13 00:00:00') AS x")
    p("ilike", "SELECT 'ABC' ILIKE 'a%' AS x")
    p("string_literal_dq", "SELECT \"c\" FROM VALUES (1) t(c)")
    spark.stop()
  }
}
