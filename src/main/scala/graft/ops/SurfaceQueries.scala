package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import OpQueries.OpQ

/** Scalar/aggregate surface batches beyond the reference's §2 inventory —
  * each a whole function family a user of an analytics engine reaches for
  * daily (regex, arg-extrema, bitwise, exact decimals), isolated as one
  * driver gate with a bit-exact DuckDB oracle. All are either pure per-row
  * expressions inside whole-stage codegen (zero shuffle beyond the output
  * sort) or map-side-combined aggregates (one shuffle) — linear at any
  * corpus size.
  *
  * Alignment rules specific to these families:
  *   - Spark `regexp_replace` replaces EVERY match; DuckDB's replaces the
  *     first unless the 'g' flag is passed — oracles always pass 'g'.
  *   - Spark `regexp_extract_all` requires an explicit group index when
  *     the pattern has a capture group; both sides use group 1 patterns.
  *   - `max_by`/`arg_max` are only deterministic when the ordering value
  *     is unique per group — gates order by a key made unique by mixing
  *     the row id into the low digits.
  *   - DECIMAL result types follow each engine's own precision/scale
  *     inference (they differ for AVG and division), so every decimal
  *     output is explicitly CAST to the same DECIMAL(p, s) on both sides.
  */
object SurfaceQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Regex function family over document text — extract / extract-all /
    * count / replace-all / match — on backtracking-free POSIX-class
    * patterns that mean the same thing in Java regex (Spark) and RE2
    * (DuckDB). Array output serialized with `to_json` for the driver's
    * comparator. Pure per-row codegen: the only exchange is the output
    * sort.
    */
  val regexFunctions = OpQ("op_regex_functions",
    (s, d) => t(s, d, "documents")
      .withColumn("text", concat(lit("id"), col("doc_id"), lit(" "), col("text")))
      .select(col("doc_id"),
        regexp_extract(col("text"), "([0-9]+)", 1).as("first_num"),
        expr("regexp_count(text, '[aeiou]')").cast("long").as("n_vowels"),
        regexp_replace(col("text"), lit("[aeiou]"), lit("_")).as("devoweled"),
        to_json(expr("regexp_extract_all(text, '(st[a-z]+)', 1)")).as("st_words"),
        col("text").rlike("str(ea|uct)").as("has_stream"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
           |  regexp_extract(text, '([0-9]+)', 1) AS first_num,
           |  CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
           |  regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
           |  CAST(to_json(regexp_extract_all(text, '(st[a-z]+)', 1)) AS VARCHAR)
           |    AS st_words,
           |  regexp_matches(text, 'str(ea|uct)') AS has_stream
           |FROM (SELECT doc_id, 'id' || doc_id || ' ' || text AS text
           |      FROM documents)
           |ORDER BY doc_id""".stripMargin))

  /** Arg-extrema and conditional aggregates — `max_by`/`min_by` (DuckDB
    * `arg_max`/`arg_min`), `count_if`, `bool_and`/`bool_or` — per return
    * flag. The ordering value `cents·10⁹ + l_orderkey` is unique per row
    * (cents < 10⁷, orderkey < 10⁹, product < 2⁶³), so the arg-extrema are
    * deterministic on both engines with NO tie-break convention in play.
    * All five aggregates carry constant-size partial state — one map-side
    * combined shuffle of |groups| rows.
    */
  val aggArgExtrema = OpQ("op_agg_argminmax",
    (s, d) => t(s, d, "lineitem")
      .withColumn("uk",
        (floor(col("l_extendedprice") * 100).cast("long") * 1000000000L +
          col("l_orderkey")))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("max_by(l_orderkey, uk)").as("priciest_order"),
        expr("min_by(l_orderkey, uk)").as("cheapest_order"),
        expr("count_if(l_quantity > 25)").as("n_bulk"),
        expr("bool_and(l_discount <= 0.1)").as("all_discount_ok"),
        expr("bool_or(l_tax > 0.07)").as("any_high_tax"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
           |  arg_max(l_orderkey, uk) AS priciest_order,
           |  arg_min(l_orderkey, uk) AS cheapest_order,
           |  CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk,
           |  bool_and(l_discount <= 0.1) AS all_discount_ok,
           |  bool_or(l_tax > 0.07) AS any_high_tax
           |FROM (SELECT *,
           |        CAST(FLOOR(l_extendedprice * 100) AS BIGINT) * 1000000000
           |          + l_orderkey AS uk
           |      FROM lineitem)
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Bitwise surface — scalar shifts/xor/and/or/not and popcount per row,
    * plus the `bit_and`/`bit_or`/`bit_xor` aggregates per group. Bit
    * aggregates are associative-commutative with 8-byte state — the ideal
    * map-side-combine shape; the scalar layer is pure codegen. Exact
    * integer semantics agree between the engines at every width used.
    */
  val bitwiseFunctions = OpQ("op_bitwise_functions",
    (s, d) => t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_suppkey"), col("l_partkey"),
        expr("shiftleft(l_suppkey, 3)").as("shl"),
        expr("shiftright(l_partkey, 2)").as("shr"),
        expr("l_suppkey ^ l_partkey").as("sxor"),
        expr("l_suppkey & 255").as("sand"),
        expr("l_partkey | 4096").as("sor"),
        expr("bit_count(l_suppkey)").cast("long").as("popcnt"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("bit_and(sand)").as("agg_and"),
        expr("bit_or(sor % 65536)").as("agg_or"),
        expr("bit_xor(sxor)").as("agg_xor"),
        sum(col("shl")).as("sum_shl"),
        sum(col("shr")).as("sum_shr"),
        sum(col("popcnt")).as("sum_popcnt"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
           |  CAST(bit_and(l_suppkey & 255) AS BIGINT) AS agg_and,
           |  CAST(bit_or((l_partkey | 4096) % 65536) AS BIGINT) AS agg_or,
           |  CAST(bit_xor(xor(l_suppkey, l_partkey)) AS BIGINT) AS agg_xor,
           |  CAST(SUM(l_suppkey * 8) AS BIGINT) AS sum_shl,
           |  CAST(SUM(l_partkey // 4) AS BIGINT) AS sum_shr,
           |  CAST(SUM(bit_count(CAST(l_suppkey AS BIT))) AS BIGINT) AS sum_popcnt
           |FROM lineitem
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Exact DECIMAL money arithmetic — the revenue aggregate computed in
    * true fixed-point DECIMAL instead of the cents-scaled BIGINT trick the
    * other gates use: prices cast to DECIMAL(18,2), the per-row
    * `price · (1 − disc) · (1 + tax)` product kept exact at scale 6, and
    * the sums explicitly CAST to DECIMAL(38,6)/(38,2) because Spark and
    * DuckDB infer different intermediate precisions (Spark dec(18,2)×dec
    * widens toward (38,6) with its own rules; DuckDB widens to (p₁+p₂,
    * s₁+s₂)) — the CAST pins the comparable type, the VALUES are exact in
    * both. Decimal sums are associative (integer arithmetic underneath),
    * so results are partition-invariant — this is the semantics a money
    * pipeline should ship instead of doubles. Outputs are serialized to
    * fixed-scale strings: DuckDB's pandas bridge degrades wide DECIMALs
    * to float64 (loses the last digit at scale 6), so the string is the
    * only representation the comparator can check EXACTLY.
    */
  val decimalExact = OpQ("op_decimal_exact",
    (s, d) => t(s, d, "lineitem")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_discount").cast("decimal(8,2)").as("disc"),
        col("l_tax").cast("decimal(8,2)").as("tax"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("price")).cast("decimal(38,2)").cast("string").as("sum_price"),
        sum((col("price") * (lit(1).cast("decimal(8,2)") - col("disc")))
          .cast("decimal(30,4)")).cast("decimal(38,4)").cast("string")
          .as("sum_disc_price"),
        sum((col("price") * (lit(1).cast("decimal(8,2)") - col("disc")) *
            (lit(1).cast("decimal(8,2)") + col("tax")))
          .cast("decimal(30,6)")).cast("decimal(38,6)").cast("string")
          .as("sum_charge"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
           |  CAST(CAST(SUM(price) AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
           |  CAST(CAST(SUM(CAST(price * (CAST(1 AS DECIMAL(8,2)) - disc)
           |        AS DECIMAL(30,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
           |  CAST(CAST(SUM(CAST(price * (CAST(1 AS DECIMAL(8,2)) - disc)
           |          * (CAST(1 AS DECIMAL(8,2)) + tax)
           |        AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
           |  COUNT(*) AS n
           |FROM (SELECT l_returnflag,
           |        CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
           |        CAST(l_discount AS DECIMAL(8,2)) AS disc,
           |        CAST(l_tax AS DECIMAL(8,2)) AS tax
           |      FROM lineitem)
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Second string-function batch — levenshtein / translate / repeat /
    * lpad / rpad / reverse / split_part / left / right, the manipulation
    * layer both engines ship under the same names and semantics
    * (levenshtein is the classic unit-cost DP on both; split_part is
    * 1-based on both). Subjects are real corpus words (first/second token
    * of each document), so edit distances vary per row. Pure per-row
    * codegen; the only exchange is the output sort.
    */
  val stringFunctions2 = OpQ("op_string_functions2",
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"), col("text"),
        expr("split_part(text, ' ', 1)").as("w1"),
        expr("split_part(text, ' ', 2)").as("w2"))
      .select(col("doc_id"), col("w1"), col("w2"),
        levenshtein(col("w1"), col("w2")).cast("long").as("edit_dist"),
        translate(col("w1"), "aeiou", "AEIOU").as("cap_vowels"),
        expr("repeat(w2, 2)").as("doubled"),
        lpad(col("doc_id").cast("string"), 8, "0").as("padded_id"),
        rpad(col("w1"), 12, ".").as("padded_w"),
        reverse(col("w1")).as("rev"),
        expr("left(text, 10)").as("head10"),
        expr("right(text, 10)").as("tail10"))
      .orderBy(col("doc_id")),
    Some("""SELECT doc_id, w1, w2,
           |  CAST(levenshtein(w1, w2) AS BIGINT) AS edit_dist,
           |  translate(w1, 'aeiou', 'AEIOU') AS cap_vowels,
           |  repeat(w2, 2) AS doubled,
           |  lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           |  rpad(w1, 12, '.') AS padded_w,
           |  reverse(w1) AS rev,
           |  left(text, 10) AS head10,
           |  right(text, 10) AS tail10
           |FROM (SELECT doc_id, text,
           |        split_part(text, ' ', 1) AS w1,
           |        split_part(text, ' ', 2) AS w2
           |      FROM documents)
           |ORDER BY doc_id""".stripMargin))

  /** Second date-function batch — end-of-month (`last_day`), month
    * arithmetic with end-of-month clamping (`add_months` ≡ DuckDB
    * `+ INTERVAL 1 MONTH`, both clamp Jan 31 + 1 mo → Feb 29), quarter
    * truncation, day-of-year, ISO week, `make_date`, and day diffs —
    * all on the DATE-cast order date so the TIMESTAMP physical type
    * never leaks into the comparison. Dates serialize as strings (the
    * cross-engine comparator convention). Per-row codegen.
    */
  val dateFunctions2 = OpQ("op_date_functions2",
    (s, d) => t(s, d, "orders")
      .withColumn("od", col("o_orderdate").cast("date"))
      .select(col("o_orderkey"),
        last_day(col("od")).cast("string").as("eom"),
        add_months(col("od"), 1).cast("string").as("next_month"),
        date_trunc("quarter", col("od")).cast("date").cast("string")
          .as("quarter_start"),
        quarter(col("od")).cast("long").as("q"),
        dayofyear(col("od")).cast("long").as("doy"),
        weekofyear(col("od")).cast("long").as("iso_week"),
        make_date(year(col("od")), month(col("od")), lit(1)).cast("string")
          .as("month_start"),
        datediff(col("od"), lit("1992-01-01").cast("date")).cast("long")
          .as("days_since_epoch_start"))
      .orderBy(col("o_orderkey")).limit(1000),
    Some("""SELECT o_orderkey,
           |  CAST(last_day(od) AS VARCHAR) AS eom,
           |  CAST(CAST(od + INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS next_month,
           |  CAST(CAST(date_trunc('quarter', od) AS DATE) AS VARCHAR)
           |    AS quarter_start,
           |  CAST(quarter(od) AS BIGINT) AS q,
           |  CAST(dayofyear(od) AS BIGINT) AS doy,
           |  CAST(weekofyear(od) AS BIGINT) AS iso_week,
           |  CAST(make_date(CAST(year(od) AS INT), CAST(month(od) AS INT), 1)
           |    AS VARCHAR) AS month_start,
           |  CAST(datediff('day', DATE '1992-01-01', od) AS BIGINT)
           |    AS days_since_epoch_start
           |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
           |ORDER BY o_orderkey LIMIT 1000""".stripMargin))

  val all: Seq[OpQ] = Seq(regexFunctions, aggArgExtrema, bitwiseFunctions,
    decimalExact, stringFunctions2, dateFunctions2)
}
