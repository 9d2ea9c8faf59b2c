package graft

import org.apache.spark.sql.SparkSession

/** Input-dialect shim (SURVEY.md §7.4).
  *
  * The reference gets DuckDB/Presto/Snowflake/BigQuery compatibility from
  * sqlglot transpilation (reference: xorbits_sql/core.py:66,102). There is no
  * JVM sqlglot, so we accept Spark SQL natively and shim only the dialect
  * constructs the reference's own test corpus exercises:
  *   - `==` equality (tests/test_execute.py:90)
  *   - `READ_CSV('path' [, 'delimiter', 'd']) AS alias` table function
  *     (tests/test_tpc_h.py:47-52, executor.py:290-308)
  * Anything else is documented unsupported-dialect.
  */
sealed trait Dialect {
  def rewrite(spark: SparkSession, sql: String): String
}

object Dialect {

  /** Native Spark SQL — no rewriting. */
  case object Spark extends Dialect {
    def rewrite(spark: SparkSession, sql: String): String = sql
  }

  /** DuckDB-ish surface used by the reference tests. Table functions we
    * do NOT shim raise [[graft.UnsupportedError]] up front — a clear
    * unsupported-dialect error instead of a confusing Spark parse error
    * (the reference's UnsupportedError analogue, executor.py:192-195).
    */
  case object DuckDbish extends Dialect {
    private val unsupported = Seq("READ_JSON", "READ_JSON_AUTO", "READ_CSV_AUTO", "GLOB")
    def rewrite(spark: SparkSession, sql: String): String = {
      unsupported.find(fn => sql.toUpperCase.contains(fn + "(")).foreach { fn =>
        throw new graft.UnsupportedError(
          s"dialect construct $fn(...) is not supported; use READ_CSV or register a table")
      }
      rewriteReadCsv(spark, rewriteDoubleEquals(sql))
    }
  }

  /** `==` → `=` outside string literals (single-pass scanner so `'a==b'`
    * stays intact).
    */
  private[graft] def rewriteDoubleEquals(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) {
        if (c == '\\' && i + 1 < sql.length) { // backslash escape inside literal
          out.append(c).append(sql.charAt(i + 1)); i += 2
        } else {
          out.append(c)
          if (c == '\'') inStr = false
          i += 1
        }
      } else if (c == '\'') { inStr = true; out.append(c); i += 1 }
      else if (c == '=' && i + 1 < sql.length && sql.charAt(i + 1) == '=') {
        out.append('='); i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private val ReadCsvRe =
    ("""(?i)READ_CSV\(\s*'([^']+)'(?:\s*,\s*'delimiter'\s*,\s*'([^']*)')?\s*\)""" +
      """(?:\s+AS\s+(\w+))?""").r

  /** Replace each READ_CSV(...) with a temp view over `spark.read.csv`.
    * Header row + schema inference mirror the reference's pandas read
    * (executor.py:290-308); dtypes can be forced by pre-registering a view.
    * The CSV scan stays a distributed Spark source — filters/pruning still
    * push into it.
    */
  private[graft] def rewriteReadCsv(spark: SparkSession, sql: String): String = {
    var n = 0
    ReadCsvRe.replaceAllIn(sql, { m =>
      val path = m.group(1)
      val delim = Option(m.group(2)).getOrElse(",")
      val alias = Option(m.group(3))
      n += 1
      val view = alias.getOrElse(s"__read_csv_$n")
      spark.read
        .option("header", "true")
        .option("sep", delim)
        .option("inferSchema", "true")
        .csv(path)
        .createOrReplaceTempView(view)
      // keep the alias binding intact for the surrounding SQL
      view + alias.map(a => s" AS $a").getOrElse("")
    })
  }
}
