package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static cost lint over every `SparkEntry.oracleSql` entry: a chained
  * multi-referenced CTE that is NOT `AS MATERIALIZED` gets re-inlined by
  * DuckDB at every reference site, so the work multiplies per chain
  * level — exponential in chain depth. That exact shape (8 rounds of
  * `s_r` referenced twice + `t_r` thrice in `llm_bpe_learn`'s oracle)
  * hung the r12 driver gate: >450 s on a 146 KB fixture vs 0.43 s
  * materialized, and one hanging oracle blanked the whole 293-green
  * board into an empty CORRECTNESS json.
  *
  * The lint computes each CTE's worst-case INLINE COUNT — how many
  * times DuckDB would instantiate its definition if nothing were
  * materialized along the way: count(C) = refs-from-main(C) + Σ over
  * referencing CTEs D of refs(D→C) × count(D), with a materialized D
  * contributing ×1 (it is computed once however often it is read).
  * A chain of double-referenced stages doubles the count per level —
  * that is the r12 shape — while an isolated double reference scores a
  * constant 2. Any UNMATERIALIZED CTE with count ≥ 4 fails the lint
  * (4× is where hand-written constant factors end and generated chains
  * begin). False positives err toward requiring MATERIALIZED, which
  * never changes results — only cost.
  */
class OracleCostLintSpec extends AnyFunSuite {

  private val MaxInlineCount = 3L

  private case class Cte(name: String, materialized: Boolean, body: String)

  /** CTE headers are `name AS (` / `name AS MATERIALIZED (`; nothing
    * else in the oracle corpus has an identifier directly before
    * `AS (` (column aliases precede `AS ident`, casts are `AS TYPE)`),
    * and a stray match only widens the lint, never narrows it. Bodies
    * are extracted by balanced-paren scan (literal-aware: quotes in
    * these oracles never contain unbalanced parens that matter for a
    * conservative lint).
    */
  private def parseCtes(sql: String): Seq[Cte] = {
    val header = """(?is)\b(\w+)\s+AS\s+(MATERIALIZED\s+)?\(""".r
    header.findAllMatchIn(sql).flatMap { m =>
      var depth = 1
      var i = m.end
      while (i < sql.length && depth > 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      if (depth == 0)
        Some(Cte(m.group(1).toLowerCase, m.group(2) != null, sql.substring(m.end, i - 1)))
      else None
    }.toSeq
  }

  /** References that INSTANTIATE a CTE are table references in
    * FROM/JOIN position — not alias-qualified column uses (`q.x`) or
    * output aliases, which share the name but never replicate the
    * definition. Comma-continued FROM lists (`FROM a, b`) are not
    * counted: in this oracle corpus the comma form only ever carries
    * UNNEST/base tables, and guessing commas from select lists would
    * over-flag every short column name.
    */
  private def tableRefCount(haystack: String, word: String): Int = {
    val w = java.util.regex.Pattern.quote(word)
    ("""(?is)\b(?:FROM|JOIN)\s+""" + w + """\b""").r.findAllIn(haystack).length
  }

  /** Unmaterialized CTEs whose worst-case inline count exceeds
    * [[MaxInlineCount]], with the count (for the error message). CTEs
    * can only reference EARLIER CTEs (no recursion in this corpus), so
    * counts resolve back-to-front: later CTEs' counts are known when an
    * earlier one sums its reference sites.
    */
  private def explosiveCtes(sql: String): Seq[(String, Long)] = {
    val ctes = parseCtes(sql)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    ctes.reverse.foreach { c =>
      val refsTotal = tableRefCount(sql, c.name)
      val selfRefs = tableRefCount(c.body, c.name)
      val fromCtes = ctes.filter(_.name != c.name).map { d =>
        val n = tableRefCount(d.body, c.name).toLong
        val mult = if (d.materialized) 1L else counts.getOrElse(d.name, 1L)
        (n, n * mult)
      }
      val fromMain = math.max(0L, refsTotal - selfRefs - fromCtes.map(_._1).sum)
      counts(c.name) = math.min(fromMain + fromCtes.map(_._2).sum, Long.MaxValue / 4)
    }
    ctes.collect {
      case c if !c.materialized && counts(c.name) > MaxInlineCount =>
        (c.name, counts(c.name))
    }
  }

  test("no oracle carries an unmaterialized multi-referenced CTE chain") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (q, sql) =>
        val bad = explosiveCtes(sql)
        if (bad.nonEmpty)
          Some(s"$q: ${bad.map { case (n, k) => s"$n (inlined ${k}x)" }.mkString(", ")} need AS MATERIALIZED")
        else None
    }
    assert(offenders.isEmpty,
      "DuckDB re-inlines unmaterialized CTEs at every reference — these chains " +
        "explode exponentially (the r12 llm_bpe_learn hang):\n" + offenders.mkString("\n"))
  }

  test("lint catches the seeded r12 counterexample (unmaterialized bpe chain)") {
    // two rounds of the exact shape that hung r12: s1 referenced by both
    // p2 and s2, t1 referenced three times by s1 — all unmaterialized
    val bad =
      """WITH s0 AS (SELECT wc, s FROM w),
        |p1 AS (SELECT x, y, SUM(wc) AS n FROM s0 GROUP BY x, y),
        |t1 AS (SELECT x, y FROM p1 ORDER BY n DESC LIMIT 1),
        |s1 AS (SELECT wc, replace(s, (SELECT x FROM t1), (SELECT y FROM t1)) AS s FROM s0),
        |p2 AS (SELECT x, y, SUM(wc) AS n FROM s1 GROUP BY x, y),
        |t2 AS (SELECT x, y FROM p2 ORDER BY n DESC LIMIT 1),
        |s2 AS (SELECT wc, replace(s, (SELECT x FROM t2), (SELECT y FROM t2)) AS s FROM s1)
        |SELECT * FROM t1 UNION ALL SELECT * FROM t2""".stripMargin
    val flagged = explosiveCtes(bad).map(_._1)
    assert(flagged.nonEmpty, "lint must flag the unmaterialized chain")
    assert(flagged.contains("s0") || flagged.contains("t1"),
      s"the chain's base (s0, inlined once per downstream replica) or t1 (3 refs/round) must be flagged; got $flagged")
  }

  test("lint passes the materialized spelling of the same chain") {
    val good =
      """WITH s0 AS MATERIALIZED (SELECT wc, s FROM w),
        |p1 AS MATERIALIZED (SELECT x, y, SUM(wc) AS n FROM s0 GROUP BY x, y),
        |t1 AS MATERIALIZED (SELECT x, y FROM p1 ORDER BY n DESC LIMIT 1),
        |s1 AS MATERIALIZED (SELECT wc, replace(s, (SELECT x FROM t1), (SELECT y FROM t1)) AS s FROM s0),
        |p2 AS MATERIALIZED (SELECT x, y, SUM(wc) AS n FROM s1 GROUP BY x, y),
        |t2 AS MATERIALIZED (SELECT x, y FROM p2 ORDER BY n DESC LIMIT 1),
        |s2 AS MATERIALIZED (SELECT wc, replace(s, (SELECT x FROM t2), (SELECT y FROM t2)) AS s FROM s1)
        |SELECT * FROM t1 UNION ALL SELECT * FROM t2""".stripMargin
    assert(explosiveCtes(good).isEmpty)
  }

  test("depth-1 double reference without a chain is allowed (constant factor)") {
    val ok =
      """WITH base AS (SELECT a, b FROM t)
        |SELECT * FROM base x JOIN base y ON x.a = y.b""".stripMargin
    assert(explosiveCtes(ok).isEmpty)
  }
}
