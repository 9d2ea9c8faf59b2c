package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Input-dialect shim (SURVEY.md §7.4).
  *
  * The reference gets DuckDB/Presto/Snowflake/BigQuery compatibility from
  * sqlglot transpilation (reference: xorbits_sql/core.py:66,102,
  * README.md:31-32). There is no JVM sqlglot, so the shim is a documented
  * construct-level rewriter: Spark SQL already accepts most of the shared
  * ANSI surface natively (TRY_CAST, ILIKE, IS NOT DISTINCT FROM, `x DIV y`,
  * `||` concat, EXISTS higher-order functions — verified by probing), and the
  * rewriter translates the constructs it does not:
  *
  * [[Dialect.DuckDbish]]:
  *   - `==` equality (reference tests/test_execute.py:90)
  *   - `expr::TYPE` cast → `CAST(expr AS TYPE)`
  *   - `"ident"` double-quoted identifiers → backtick-quoted
  *   - `a // b` integer division → `a DIV b`
  *   - `strftime(ts, '%Y-%m')` → `date_format(ts, 'yyyy-MM')` (C format
  *     codes translated to Java patterns; unknown codes raise)
  *   - `string_split(s, sep)` → `split(s, <regex-quoted sep>)` (DuckDB's
  *     separator is literal, Spark's is a regex — the shim \Q-quotes it)
  *   - function renames: len→length, list_contains→array_contains,
  *     list_value→array, list_sort→sort_array, list_distinct→array_distinct,
  *     array_length→size, regexp_matches→regexp_like, epoch→unix_timestamp
  *   - `READ_CSV('path' [, 'delimiter', 'd']) AS alias` table function
  *     (reference tests/test_tpc_h.py:47-52, executor.py:290-308); a
  *     declared schema for the alias wins over inference (executor.py:303-305)
  *
  * [[Dialect.Trinoish]] (Presto/Trino names for Spark builtins):
  *   approx_distinct→approx_count_distinct, strpos→instr,
  *   arbitrary→any_value, json_extract_scalar→get_json_object,
  *   to_unixtime→unix_timestamp, codepoint→ascii.
  *
  * Everything the rewriter does is textual and literal-span-aware: content
  * of single-quoted SQL string literals is never touched.
  */
sealed trait Dialect {
  def rewrite(spark: SparkSession, sql: String,
      schemas: Map[String, StructType] = Map.empty): String
}

object Dialect {

  /** Native Spark SQL — no rewriting. */
  case object Spark extends Dialect {
    def rewrite(spark: SparkSession, sql: String,
        schemas: Map[String, StructType]): String = sql
  }

  /** DuckDB-ish surface (constructs above). Table functions we do NOT shim
    * raise [[graft.UnsupportedError]] up front — a clear unsupported-dialect
    * error instead of a confusing Spark parse error (the reference's
    * UnsupportedError analogue, executor.py:192-195).
    */
  case object DuckDbish extends Dialect {
    private val unsupported = Seq("READ_JSON", "READ_JSON_AUTO", "READ_CSV_AUTO", "GLOB")
    private val renames = Map(
      "len" -> "length",
      "list_contains" -> "array_contains",
      "list_has" -> "array_contains",
      "list_value" -> "array",
      "list_sort" -> "sort_array",
      "list_distinct" -> "array_distinct",
      "array_length" -> "size",
      "regexp_matches" -> "regexp_like",
      "epoch" -> "unix_timestamp")

    def rewrite(spark: SparkSession, sql: String,
        schemas: Map[String, StructType]): String = {
      unsupported.find(fn => sql.toUpperCase.contains(fn + "(")).foreach { fn =>
        throw new graft.UnsupportedError(
          s"dialect construct $fn(...) is not supported; use READ_CSV or register a table")
      }
      val steps: Seq[String => String] = Seq(
        rewriteDoubleEquals,
        rewriteDoubleQuotedIdents,
        rewriteIntDiv,
        rewriteColonCast,
        rewriteStrftime,
        rewriteStringSplit,
        s => renameFunctions(s, renames))
      rewriteReadCsv(spark, steps.foldLeft(sql)((s, f) => f(s)), schemas)
    }
  }

  /** Presto/Trino function-name surface over Spark SQL. Most Trino syntax
    * (TRY_CAST, `||`, lambda `x -> ...`, UNNEST-as-LATERAL-VIEW differences
    * aside) is already Spark-native; this maps the common function renames.
    */
  case object Trinoish extends Dialect {
    private val renames = Map(
      "approx_distinct" -> "approx_count_distinct",
      "strpos" -> "instr",
      "arbitrary" -> "any_value",
      "json_extract_scalar" -> "get_json_object",
      "to_unixtime" -> "unix_timestamp",
      "codepoint" -> "ascii")
    def rewrite(spark: SparkSession, sql: String,
        schemas: Map[String, StructType]): String =
      renameFunctions(rewriteDoubleEquals(sql), renames)
  }

  // ---- literal-span machinery ---------------------------------------------

  /** [start, end) spans of single-quoted string literals, honoring backslash
    * escapes and doubled-quote ('') escapes. Every rewrite below leaves these
    * spans untouched.
    */
  private[graft] def literalSpans(sql: String): Vector[(Int, Int)] = {
    val spans = Vector.newBuilder[(Int, Int)]
    var i = 0
    while (i < sql.length) {
      if (sql.charAt(i) == '\'') {
        val start = i
        i += 1
        var done = false
        while (i < sql.length && !done) {
          val c = sql.charAt(i)
          if (c == '\\' && i + 1 < sql.length) i += 2
          else if (c == '\'' && i + 1 < sql.length && sql.charAt(i + 1) == '\'') i += 2
          else if (c == '\'') { done = true; i += 1 }
          else i += 1
        }
        spans += ((start, i))
      } else i += 1
    }
    spans.result()
  }

  private def outsideLiterals(spans: Vector[(Int, Int)], i: Int): Boolean =
    !spans.exists(s => i >= s._1 && i < s._2)

  /** `==` → `=` outside string literals. */
  private[graft] def rewriteDoubleEquals(sql: String): String = {
    val spans = literalSpans(sql)
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (outsideLiterals(spans, i) && sql.charAt(i) == '=' &&
          i + 1 < sql.length && sql.charAt(i + 1) == '=') {
        out.append('='); i += 2
      } else { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** DuckDB `"ident"` → Spark backtick `ident` (doubled "" inside becomes a
    * literal quote). Spark's default parser reads double quotes as string
    * literals, which would silently change semantics — so always rewrite.
    */
  private[graft] def rewriteDoubleQuotedIdents(sql: String): String = {
    val spans = literalSpans(sql)
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (outsideLiterals(spans, i) && sql.charAt(i) == '"') {
        val ident = new StringBuilder
        i += 1
        var done = false
        while (i < sql.length && !done) {
          val c = sql.charAt(i)
          if (c == '"' && i + 1 < sql.length && sql.charAt(i + 1) == '"') {
            ident.append('"'); i += 2
          } else if (c == '"') { done = true; i += 1 }
          else { ident.append(c); i += 1 }
        }
        out.append('`').append(ident.toString.replace("`", "``")).append('`')
      } else { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** DuckDB `a // b` integer division → Spark `a DIV b`. `//` cannot appear
    * in any other SQL construct outside a string literal, so the rewrite is
    * unambiguous.
    */
  private[graft] def rewriteIntDiv(sql: String): String = {
    val spans = literalSpans(sql)
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (outsideLiterals(spans, i) && sql.charAt(i) == '/' &&
          i + 1 < sql.length && sql.charAt(i + 1) == '/') {
        out.append(" DIV "); i += 2
      } else { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** `expr::TYPE` → `CAST(expr AS TYPE)`. The operand is recovered by
    * scanning left: a string literal, a parenthesized/bracketed tail with its
    * leading function name (`floor(x)::BIGINT`), or an identifier/number.
    * TYPE is a single word with optional `(p[,s])` args (DECIMAL(12,2));
    * multi-word types (DOUBLE PRECISION) are not shimmed. Chained casts work
    * because each pass rewrites the leftmost `::` and re-scans.
    */
  private[graft] def rewriteColonCast(sql: String): String = {
    var cur = sql
    var guard = 0
    while (guard < 64) {
      val spans = literalSpans(cur)
      val idx = {
        var i = 0
        var found = -1
        while (i < cur.length - 1 && found < 0) {
          if (cur.charAt(i) == ':' && cur.charAt(i + 1) == ':' && outsideLiterals(spans, i))
            found = i
          else i += 1
        }
        found
      }
      if (idx < 0) return cur
      // --- type name after `::`
      var t = idx + 2
      while (t < cur.length && cur.charAt(t) == ' ') t += 1
      val tStart = t
      while (t < cur.length && (cur.charAt(t).isLetterOrDigit || cur.charAt(t) == '_')) t += 1
      if (t == tStart)
        throw new graft.UnsupportedError(s"cannot parse type after '::' at $idx in: $cur")
      // optional (p[,s]) precision args
      var tEnd = t
      if (tEnd < cur.length && cur.charAt(tEnd) == '(') {
        val close = cur.indexOf(')', tEnd)
        if (close > 0 && cur.substring(tEnd + 1, close).forall(c => c.isDigit || c == ',' || c == ' '))
          tEnd = close + 1
      }
      val typ = cur.substring(tStart, tEnd)
      // --- operand before `::`
      var e = idx - 1
      while (e >= 0 && cur.charAt(e) == ' ') e -= 1
      if (e < 0) throw new graft.UnsupportedError(s"no operand before '::' in: $cur")
      val opStart: Int = cur.charAt(e) match {
        case '\'' =>
          // end of a string literal: find its span
          spans.find(s => s._2 - 1 == e).map(_._1).getOrElse(
            throw new graft.UnsupportedError(s"unbalanced string literal before '::' in: $cur"))
        case ')' | ']' =>
          var depth = 0
          var j = e
          var start = -1
          while (j >= 0 && start < 0) {
            if (outsideLiterals(spans, j)) {
              val c = cur.charAt(j)
              if (c == ')' || c == ']') depth += 1
              else if (c == '(' || c == '[') { depth -= 1; if (depth == 0) start = j }
            }
            j -= 1
          }
          if (start < 0)
            throw new graft.UnsupportedError(s"unbalanced parens before '::' in: $cur")
          // include a leading function name: floor(x)::T casts floor(x)
          var k = start - 1
          while (k >= 0 && (cur.charAt(k).isLetterOrDigit || cur.charAt(k) == '_')) k -= 1
          k + 1
        case c if c.isLetterOrDigit || c == '_' || c == '.' || c == '`' =>
          var k = e
          while (k >= 0 && (cur.charAt(k).isLetterOrDigit ||
              "._`".indexOf(cur.charAt(k)) >= 0)) k -= 1
          k + 1
        case other =>
          throw new graft.UnsupportedError(s"cannot parse operand '$other' before '::' in: $cur")
      }
      val operand = cur.substring(opStart, e + 1)
      cur = cur.substring(0, opStart) + s"CAST($operand AS $typ)" + cur.substring(tEnd)
      guard += 1
    }
    throw new graft.UnsupportedError("too many '::' casts in one statement (>64)")
  }

  /** C strftime codes → Java SimpleDateFormat-style pattern for
    * `date_format`. Literal letters are quoted ('T'), `'` becomes `''`.
    * Unknown `%` codes raise [[graft.UnsupportedError]] (a silently wrong
    * format string is worse than an error).
    */
  private[graft] def translateStrftimeFormat(fmt: String): String = {
    val codes = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
      'j' -> "DDD", 'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM",
      'B' -> "MMMM", 'p' -> "a", 'f' -> "SSSSSS", 'Z' -> "zz", 'z' -> "xx")
    val out = new StringBuilder
    val lit = new StringBuilder
    // literal runs are quoted as ONE section: per-char quoting would emit
    // 'd''a''y', which Java reads as d-quote-a-quote-y ('' = literal quote)
    def flush(): Unit = if (lit.nonEmpty) {
      val s = lit.toString
      if (s.exists(_.isLetter)) out.append('\'').append(s.replace("'", "''")).append('\'')
      else out.append(s.replace("'", "''"))
      lit.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val code = fmt.charAt(i + 1)
        if (code == '%') { lit.append('%'); i += 2 }
        else {
          flush()
          out.append(codes.getOrElse(code,
            throw new graft.UnsupportedError(s"strftime code %$code is not supported")))
          i += 2
        }
      } else { lit.append(c); i += 1 }
    }
    flush()
    out.toString
  }

  /** Find the `)` matching the `(` at `open` (literal-span aware). */
  private def matchParen(sql: String, spans: Vector[(Int, Int)], open: Int): Int = {
    var depth = 0
    var i = open
    while (i < sql.length) {
      if (outsideLiterals(spans, i)) {
        val c = sql.charAt(i)
        if (c == '(') depth += 1
        else if (c == ')') { depth -= 1; if (depth == 0) return i }
      }
      i += 1
    }
    -1
  }

  /** Split `sql[from, to)` on top-level commas (literal-span aware). */
  private def splitArgs(sql: String, spans: Vector[(Int, Int)], from: Int, to: Int): Seq[String] = {
    val args = Seq.newBuilder[String]
    var depth = 0
    var last = from
    var i = from
    while (i < to) {
      if (outsideLiterals(spans, i)) {
        val c = sql.charAt(i)
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (c == ',' && depth == 0) { args += sql.substring(last, i); last = i + 1 }
      }
      i += 1
    }
    args += sql.substring(last, to)
    args.result()
  }

  private val SingleLiteral = """^\s*'(.*)'\s*$""".r

  /** `strftime(expr, '%Y-%m')` → `date_format(expr, 'yyyy-MM')`. The format
    * must be a string literal (dynamic formats would need runtime
    * translation — unsupported, raises).
    */
  private[graft] def rewriteStrftime(sql: String): String = {
    val re = """(?i)\bstrftime\s*\(""".r
    var cur = sql
    var changed = true
    while (changed) {
      changed = false
      val spans = literalSpans(cur)
      re.findAllMatchIn(cur).find(m => outsideLiterals(spans, m.start)).foreach { m =>
        val open = cur.indexOf('(', m.start)
        val close = matchParen(cur, spans, open)
        if (close < 0) throw new graft.UnsupportedError(s"unbalanced strftime( in: $cur")
        val args = splitArgs(cur, spans, open + 1, close)
        if (args.length != 2)
          throw new graft.UnsupportedError("strftime expects (expr, 'format')")
        val fmt = args(1) match {
          case SingleLiteral(f) => translateStrftimeFormat(f)
          case _ => throw new graft.UnsupportedError(
            "strftime format must be a string literal")
        }
        // the Java pattern may itself contain quotes ('day 'dd) — double
        // them so the embedded SQL literal stays balanced
        cur = cur.substring(0, m.start) + "date_format(" + args(0).trim + ", '" +
          fmt.replace("'", "''") + "')" + cur.substring(close + 1)
        changed = true
      }
    }
    cur
  }

  /** `string_split(s, sep)` → `split(s, <regex>)`. DuckDB's separator is a
    * literal; Spark's is a Java regex, so a literal separator is \Q-quoted
    * and a dynamic one is wrapped `concat('\\Q', sep, '\\E')`. A literal
    * containing `\E` cannot be \Q-quoted — raises.
    */
  private[graft] def rewriteStringSplit(sql: String): String = {
    val re = """(?i)\b(?:string_split|str_split|string_to_array)\s*\(""".r
    var cur = sql
    var changed = true
    while (changed) {
      changed = false
      val spans = literalSpans(cur)
      re.findAllMatchIn(cur).find(m => outsideLiterals(spans, m.start)).foreach { m =>
        val open = cur.indexOf('(', m.start)
        val close = matchParen(cur, spans, open)
        if (close < 0) throw new graft.UnsupportedError(s"unbalanced string_split( in: $cur")
        val args = splitArgs(cur, spans, open + 1, close)
        if (args.length != 2)
          throw new graft.UnsupportedError("string_split expects (expr, separator)")
        val sep = args(1) match {
          case SingleLiteral(lit) =>
            if (lit.contains("\\E"))
              throw new graft.UnsupportedError("string_split separator containing \\E is not supported")
            "'\\\\Q" + lit + "\\\\E'"
          case dyn => s"concat('\\\\Q', ${dyn.trim}, '\\\\E')"
        }
        cur = cur.substring(0, m.start) + "split(" + args(0).trim + ", " + sep + ")" +
          cur.substring(close + 1)
        changed = true
      }
    }
    cur
  }

  /** Rename `from(` → `to(` at word boundaries, outside string literals. */
  private[graft] def renameFunctions(sql: String, renames: Map[String, String]): String = {
    renames.foldLeft(sql) { case (cur, (from, to)) =>
      val spans = literalSpans(cur)
      val re = ("(?i)\\b" + java.util.regex.Pattern.quote(from) + "\\s*\\(").r
      val out = new StringBuilder
      var last = 0
      re.findAllMatchIn(cur).foreach { m =>
        if (outsideLiterals(spans, m.start)) {
          out.append(cur.substring(last, m.start)).append(to).append('(')
          last = m.end
        }
      }
      out.append(cur.substring(last))
      out.toString
    }
  }

  // ---- READ_CSV table function --------------------------------------------

  private val ReadCsvRe =
    ("""(?i)READ_CSV\(\s*'([^']+)'(?:\s*,\s*'delimiter'\s*,\s*'([^']*)')?\s*\)""" +
      """(?:\s+AS\s+(\w+))?""").r

  /** Replace each READ_CSV(...) with a temp view over `spark.read.csv`.
    * Header row mirrors the reference's pandas read (executor.py:290-308).
    * A schema declared for the view's alias (the reference's `schemas`
    * argument, executor.py:303-305) is applied directly — the CSV is read
    * ONCE with the declared types and no inference pass; without one,
    * `inferSchema` scans the file at planning time (the pandas-equivalent
    * behavior). View registration happens after matching — no side effects
    * inside the regex replace. The CSV scan stays a distributed Spark
    * source — filters/pruning still push into it.
    */
  private[graft] def rewriteReadCsv(spark: SparkSession, sql: String,
      schemas: Map[String, StructType] = Map.empty): String = {
    var n = 0
    val pending = Seq.newBuilder[(String, String, String, Option[StructType])]
    val rewritten = ReadCsvRe.replaceAllIn(sql, { m =>
      val path = m.group(1)
      val delim = Option(m.group(2)).getOrElse(",")
      val alias = Option(m.group(3))
      n += 1
      val view = alias.getOrElse(s"__read_csv_$n")
      pending += ((view, path, delim, alias.flatMap(schemas.get)))
      // keep the alias binding intact for the surrounding SQL
      java.util.regex.Matcher.quoteReplacement(
        view + alias.map(a => s" AS $a").getOrElse(""))
    })
    pending.result().foreach { case (view, path, delim, schema) =>
      val reader = spark.read.option("header", "true").option("sep", delim)
      val df = schema match {
        case Some(st) => reader.schema(st).csv(path)
        case None => reader.option("inferSchema", "true").csv(path)
      }
      df.createOrReplaceTempView(view)
    }
    rewritten
  }
}
