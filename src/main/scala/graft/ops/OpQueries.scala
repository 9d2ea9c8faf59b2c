package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Relational._

/** Per-operator driver queries — one entry per line of the SURVEY.md §2
  * operator inventory, implemented through the DataFrame API (the operator
  * library), each with a DuckDB oracle. Where TpchQueries exercises whole
  * query shapes through `Engine.execute` SQL, these isolate individual
  * operators through [[Relational]] and `org.apache.spark.sql.functions`.
  *
  * Determinism rules are the same as TpchQueries: exact integer cents for
  * float aggregates, FLOOR before any double→int conversion, explicit NULLS
  * FIRST/LAST whenever a sort key is nullable (Spark defaults NULLS FIRST
  * on ASC, DuckDB defaults NULLS LAST), and a total order under every LIMIT.
  */
object OpQueries {

  final case class OpQ(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- §2.1 plan-step operators ------------------------------------------

  /** Scan + project + filter + limit (reference: executor.py:254-278,310-323).
    * Filter and 3-column projection push into the parquet scan.
    */
  val scanProjectFilterLimit = OpQ("op_scan_project_filter_limit",
    (s, d) => t(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .filter(col("l_quantity") > 45)
      .orderBy(col("l_orderkey"), col("l_linenumber"))
      .limit(50),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
           |WHERE l_quantity > 45
           |ORDER BY l_orderkey, l_linenumber LIMIT 50""".stripMargin))

  /** Group aggregate with partial/final split (executor.py:325-372). */
  val aggregateGroup = OpQ("op_aggregate_group",
    (s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        moneySum(col("l_extendedprice"), "sum_price"),
        exactAvg(col("l_quantity"), "avg_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(*) AS n,
           |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)/100 AS sum_price,
           |  CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS DOUBLE)/10000
           |    / COUNT(l_quantity) AS avg_qty,
           |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Global (no-key) aggregate. */
  val aggregateGlobal = OpQ("op_aggregate_global",
    (s, d) => t(s, d, "orders")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price")),
    Some("""SELECT COUNT(*) AS n_orders, COUNT(DISTINCT o_custkey) AS n_custs,
           |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
           |FROM orders""".stripMargin))

  /** DISTINCT = group-by-all-keys (executor.py:360-362). */
  val distinctOp = OpQ("op_distinct",
    (s, d) => t(s, d, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** COUNT(DISTINCT) per group — beyond the reference's surface
    * (executor.py:344-347 raises UnsupportedError).
    */
  val countDistinctOp = OpQ("op_count_distinct",
    (s, d) => t(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs
           |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** STDDEV/VARIANCE (reference maps to pandas std/var, executor.py:37-38)
    * via exact integer moments so any aggregation order gives identical
    * doubles — see [[Relational.exactMoments]].
    */
  val statsMoments = OpQ("op_stats_moments",
    (s, d) => exactMoments(t(s, d, "lineitem"), col("l_quantity"), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("var_samp_exact"), col("stddev_samp_exact"))
      .orderBy(col("l_returnflag")),
    Some("""WITH m AS (
           |  SELECT l_returnflag, SUM(c) AS s1, SUM(c*c) AS s2, COUNT(*) AS n
           |  FROM (SELECT l_returnflag, CAST(FLOOR(l_quantity * 100) AS BIGINT) AS c
           |        FROM lineitem) b
           |  GROUP BY l_returnflag)
           |SELECT l_returnflag,
           |  (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
           |    / (n - 1) / 10000.0 AS var_samp_exact,
           |  SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
           |    / (n - 1) / 10000.0) AS stddev_samp_exact
           |FROM m ORDER BY l_returnflag""".stripMargin))

  /** HAVING = post-aggregation filter (executor.py:366-368). */
  val havingOp = OpQ("op_having",
    (s, d) => t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("n_orders").desc, col("o_custkey")),
    Some("""SELECT o_custkey, COUNT(*) AS n_orders FROM orders
           |GROUP BY o_custkey HAVING COUNT(*) >= 15
           |ORDER BY n_orders DESC, o_custkey""".stripMargin))

  // ---- §2.5 joins --------------------------------------------------------

  /** Equi inner join (hash path, executor.py:431-471); small dim side is
    * broadcast by Catalyst automatically.
    */
  val joinInner = OpQ("op_join_inner",
    (s, d) => t(s, d, "customer")
      .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"))
      .orderBy(col("c_custkey")).limit(100),
    Some("""SELECT c_custkey, c_name, n_name FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |ORDER BY c_custkey LIMIT 100""".stripMargin))

  /** Left outer join; unmatched rows keep NULLs, COUNT(col) skips them. */
  val joinLeft = OpQ("op_join_left",
    (s, d) => t(s, d, "nation")
      .join(t(s, d, "supplier"), col("n_nationkey") === col("s_nationkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(col("s_suppkey")).as("n_supp"))
      .orderBy(col("n_name")),
    Some("""SELECT n_name, COUNT(s_suppkey) AS n_supp
           |FROM nation LEFT OUTER JOIN supplier ON n_nationkey = s_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** Right outer join (executor.py:457-461 handles LEFT/RIGHT only). */
  val joinRight = OpQ("op_join_right",
    (s, d) => t(s, d, "supplier")
      .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"), "right")
      .groupBy(col("n_name"))
      .agg(count(col("s_suppkey")).as("n_supp"))
      .orderBy(col("n_name")),
    Some("""SELECT n_name, COUNT(s_suppkey) AS n_supp
           |FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin))

  /** FULL OUTER join — implemented correctly (the reference silently
    * degrades FULL to inner, SURVEY.md §2.9 Q9). Supplier side restricted so
    * both null directions actually occur.
    */
  val joinFull = OpQ("op_join_full",
    (s, d) => {
      val cust = t(s, d, "customer").groupBy(col("c_nationkey").as("nkey"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = t(s, d, "supplier").filter(col("s_nationkey") < 10)
        .groupBy(col("s_nationkey").as("skey")).agg(count(lit(1)).as("n_supp"))
      cust.join(supp, col("nkey") === col("skey"), "full")
        .select(coalesce(col("nkey"), col("skey")).as("nationkey"),
          col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    },
    Some("""SELECT COALESCE(nkey, skey) AS nationkey, n_cust, n_supp
           |FROM (SELECT c_nationkey AS nkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
           |FULL OUTER JOIN (SELECT s_nationkey AS skey, COUNT(*) AS n_supp FROM supplier
           |                 WHERE s_nationkey < 10 GROUP BY s_nationkey) s
           |ON nkey = skey
           |ORDER BY nationkey""".stripMargin))

  /** Cross join (nested-loop path, executor.py:414-429). */
  val joinCross = OpQ("op_join_cross",
    (s, d) => t(s, d, "region")
      .crossJoin(t(s, d, "lineitem").select(col("l_linestatus")).distinct())
      .select(col("r_name"), col("l_linestatus"))
      .orderBy(col("r_name"), col("l_linestatus")),
    Some("""SELECT r_name, l_linestatus
           |FROM region CROSS JOIN (SELECT DISTINCT l_linestatus FROM lineitem) t
           |ORDER BY r_name, l_linestatus""".stripMargin))

  /** Semi join — native left_semi (EXISTS without the sqlglot LEFT JOIN
    * rewrite the reference relies on, SURVEY.md §2.5).
    */
  val joinSemi = OpQ("op_join_semi",
    (s, d) => semiJoin(
      t(s, d, "customer"),
      t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
      col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey")).limit(100),
    Some("""SELECT c_custkey, c_name FROM customer
           |WHERE EXISTS (SELECT 1 FROM orders
           |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
           |ORDER BY c_custkey LIMIT 100""".stripMargin))

  /** Anti join — native left_anti (NOT EXISTS). */
  val joinAnti = OpQ("op_join_anti",
    (s, d) => antiJoin(
      t(s, d, "customer"),
      t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
      col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey")).limit(100),
    Some("""SELECT c_custkey, c_acctbal FROM customer
           |WHERE NOT EXISTS (SELECT 1 FROM orders
           |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
           |ORDER BY c_custkey LIMIT 100""".stripMargin))

  /** Expression join keys (reference materializes `__on_i` temp columns,
    * executor.py:443-455; Spark joins on expressions natively).
    */
  val joinExprKeys = OpQ("op_join_expr_keys",
    (s, d) => t(s, d, "supplier")
      .join(t(s, d, "nation"), col("s_nationkey") + 1 === col("n_nationkey") + 1)
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey")),
    Some("""SELECT s_suppkey, s_name, n_name FROM supplier
           |JOIN nation ON (s_nationkey + 1) = (n_nationkey + 1)
           |ORDER BY s_suppkey""".stripMargin))

  /** Theta (non-equi) join — residual condition (executor.py:392-396);
    * Spark plans BroadcastNestedLoopJoin.
    */
  val joinTheta = OpQ("op_join_theta",
    (s, d) => {
      val r1 = t(s, d, "region").select(col("r_regionkey").as("a_key"), col("r_name").as("a_name"))
      val r2 = t(s, d, "region").select(col("r_regionkey").as("b_key"), col("r_name").as("b_name"))
      r1.join(r2, col("a_key") < col("b_key"))
        .select(col("a_name"), col("b_name"))
        .orderBy(col("a_name"), col("b_name"))
    },
    Some("""SELECT r1.r_name AS a_name, r2.r_name AS b_name
           |FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey
           |ORDER BY a_name, b_name""".stripMargin))

  /** Multi-way left-deep join chain (executor.py:374-412) — Spark reorders
    * and broadcasts small dims itself.
    */
  val joinMultiway = OpQ("op_join_multiway",
    (s, d) => t(s, d, "region")
      .join(t(s, d, "nation"), col("r_regionkey") === col("n_regionkey"))
      .join(t(s, d, "supplier"), col("n_nationkey") === col("s_nationkey"))
      .join(t(s, d, "lineitem"), col("s_suppkey") === col("l_suppkey"))
      .groupBy(col("r_name"))
      .agg(moneySum(col("l_extendedprice"), "revenue"), count(lit(1)).as("n_lines"))
      .orderBy(col("r_name")),
    Some("""SELECT r_name,
           |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)/100 AS revenue,
           |  COUNT(*) AS n_lines
           |FROM region
           |JOIN nation ON r_regionkey = n_regionkey
           |JOIN supplier ON n_nationkey = s_nationkey
           |JOIN lineitem ON s_suppkey = l_suppkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin))

  // ---- §2.6 sort / top-k / set ops ---------------------------------------

  /** Multi-key sort with per-key direction AND per-key null placement — a
    * superset of the reference, which forces one global nulls setting
    * (executor.py:499-502, SURVEY.md §2.9 Q8). NULLS FIRST is explicit in
    * the oracle because DuckDB defaults NULLS LAST on ASC while Spark
    * defaults NULLS FIRST.
    */
  val sortMultikeyNulls = OpQ("op_sort_multikey_nulls",
    (s, d) => t(s, d, "customer")
      .select(nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"), col("c_custkey"))
      .orderBy(col("seg").asc_nulls_first, col("c_custkey").desc)
      .limit(100),
    Some("""SELECT NULLIF(c_mktsegment, 'BUILDING') AS seg, c_custkey FROM customer
           |ORDER BY seg ASC NULLS FIRST, c_custkey DESC LIMIT 100""".stripMargin))

  /** Top-k: sort+limit planned as TakeOrderedAndProject (no global sort). */
  val topKOp = OpQ("op_topk",
    (s, d) => topK(t(s, d, "orders")
      .select(col("o_orderkey"), col("o_totalprice")),
      25, col("o_totalprice").desc, col("o_orderkey")),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin))

  /** LIMIT ... OFFSET pagination. */
  val offsetOp = OpQ("op_limit_offset",
    (s, d) => t(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy(col("o_orderkey")).offset(10).limit(20),
    Some("""SELECT o_orderkey, o_custkey FROM orders
           |ORDER BY o_orderkey LIMIT 20 OFFSET 10""".stripMargin))

  private def custNations(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_nationkey").as("nkey"))
  private def suppNations(s: SparkSession, d: String): DataFrame =
    t(s, d, "supplier").select(col("s_nationkey").as("nkey"))

  /** Set operations — parsed-but-unimplemented in the reference
    * (executor.py:513-516); all six variants here. DataFrame.union is bag
    * semantics, so SQL UNION = union+distinct ([[Relational.union]]).
    */
  val setUnion = OpQ("op_set_union",
    (s, d) => Relational.union(custNations(s, d), suppNations(s, d)).orderBy(col("nkey")),
    Some("""SELECT c_nationkey AS nkey FROM customer UNION SELECT s_nationkey FROM supplier
           |ORDER BY nkey""".stripMargin))

  val setUnionAll = OpQ("op_set_union_all",
    (s, d) => Relational.unionAll(custNations(s, d), suppNations(s, d)).orderBy(col("nkey")),
    Some("""SELECT c_nationkey AS nkey FROM customer UNION ALL SELECT s_nationkey FROM supplier
           |ORDER BY nkey""".stripMargin))

  val setIntersect = OpQ("op_set_intersect",
    (s, d) => Relational.intersect(custNations(s, d), suppNations(s, d)).orderBy(col("nkey")),
    Some("""SELECT c_nationkey AS nkey FROM customer INTERSECT SELECT s_nationkey FROM supplier
           |ORDER BY nkey""".stripMargin))

  val setIntersectAll = OpQ("op_set_intersect_all",
    (s, d) => Relational.intersectAll(custNations(s, d), suppNations(s, d)).orderBy(col("nkey")),
    Some("""SELECT c_nationkey AS nkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier
           |ORDER BY nkey""".stripMargin))

  val setExcept = OpQ("op_set_except",
    (s, d) => Relational.except(
      custNations(s, d),
      t(s, d, "supplier").filter(col("s_nationkey") < 10).select(col("s_nationkey").as("nkey")))
      .orderBy(col("nkey")),
    Some("""SELECT c_nationkey AS nkey FROM customer
           |EXCEPT SELECT s_nationkey FROM supplier WHERE s_nationkey < 10
           |ORDER BY nkey""".stripMargin))

  val setExceptAll = OpQ("op_set_except_all",
    (s, d) => Relational.exceptAll(
      custNations(s, d),
      t(s, d, "supplier").filter(col("s_nationkey") < 10).select(col("s_nationkey").as("nkey")))
      .orderBy(col("nkey")),
    Some("""SELECT c_nationkey AS nkey FROM customer
           |EXCEPT ALL SELECT s_nationkey FROM supplier WHERE s_nationkey < 10
           |ORDER BY nkey""".stripMargin))

  // ---- §2.3/§2.7 scalar surface ------------------------------------------

  /** CASE WHEN / LIKE / NOT LIKE / IN / BETWEEN / SUBSTRING (SURVEY §2.7). */
  val scalarCaseLikeIn = OpQ("op_scalar_case_like_in",
    (s, d) => t(s, d, "part")
      .select(
        col("p_partkey"),
        when(col("p_size").between(1, 10), "small")
          .when(col("p_size").between(11, 30), "mid")
          .otherwise("big").as("size_class"),
        col("p_name").like("%red%").as("is_red"),
        (!col("p_type").like("MEDIUM%")).as("not_medium"),
        col("p_type").isin("PROMO", "ECONOMY").as("cheap_type"),
        substring(col("p_brand"), 7, 2).as("brand_suffix"))
      .orderBy(col("p_partkey")).limit(200),
    Some("""SELECT p_partkey,
           |  CASE WHEN p_size BETWEEN 1 AND 10 THEN 'small'
           |       WHEN p_size BETWEEN 11 AND 30 THEN 'mid'
           |       ELSE 'big' END AS size_class,
           |  (p_name LIKE '%red%') AS is_red,
           |  (p_type NOT LIKE 'MEDIUM%') AS not_medium,
           |  p_type IN ('PROMO', 'ECONOMY') AS cheap_type,
           |  SUBSTRING(p_brand, 7, 2) AS brand_suffix
           |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin))

  /** Arithmetic (+,-,*,/ — executor.py:167-181) and three-valued NULL logic
    * (IS NULL / COALESCE / NULLIF — the reference's pandas NaN==x quirk
    * corrected, SURVEY.md §2.9 Q5).
    */
  val scalarArithNull = OpQ("op_scalar_arith_null",
    (s, d) => t(s, d, "orders")
      .select(
        col("o_orderkey"),
        (col("o_totalprice") * 0.1 - 5).as("adj"),
        nullif(col("o_orderstatus"), lit("O")).as("status_nn"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_c"),
        nullif(col("o_orderstatus"), lit("O")).isNull.as("is_open"))
      .orderBy(col("o_orderkey")).limit(200),
    Some("""SELECT o_orderkey,
           |  o_totalprice * 0.1 - 5 AS adj,
           |  NULLIF(o_orderstatus, 'O') AS status_nn,
           |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_c,
           |  (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open
           |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin))

  /** Null-safe equality `<=>` (reference `IS`, executor.py:203-208; DuckDB
    * spelling IS NOT DISTINCT FROM): NULL <=> NULL is TRUE, NULL <=> x is
    * FALSE — never NULL. NULLs are manufactured with NULLIF since the TPC-H
    * tables carry none.
    */
  val scalarNullSafeEq = OpQ("op_scalar_null_safe_eq",
    (s, d) => t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (nullif(col("l_returnflag"), lit("N")) <=> nullif(col("l_linestatus"), lit("F")))
          .as("both_null_eq"),
        (nullif(col("l_returnflag"), lit("N")) <=> lit("R")).as("null_vs_r"),
        (col("l_returnflag") <=> col("l_linestatus")).as("plain_eq"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(200),
    Some("""SELECT l_orderkey, l_linenumber,
           |  (NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM NULLIF(l_linestatus, 'F'))
           |    AS both_null_eq,
           |  (NULLIF(l_returnflag, 'N') IS NOT DISTINCT FROM 'R') AS null_vs_r,
           |  (l_returnflag IS NOT DISTINCT FROM l_linestatus) AS plain_eq
           |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin))

  /** ARRAY_AGG + higher-order EXISTS (the reference's Q21 decorrelation
    * artifact, tests/tpc-h/tpc-h.sql:1316-1351: ARRAY_AGG then ARRAY_ANY):
    * collect_list sorted for determinism, membership via `exists(col, λ)`,
    * array rendered as a string so the oracle compare stays scalar.
    */
  val arrayAggOp = OpQ("op_array_agg",
    (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") < 600)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
      .select(
        col("l_orderkey"),
        concat_ws(",", col("lines")).as("lines_str"),
        expr("exists(lines, x -> x = 3)").as("has_line3"),
        size(col("lines")).cast("long").as("n_lines"))
      .orderBy(col("l_orderkey")),
    Some("""SELECT l_orderkey,
           |  array_to_string(list_sort(list(l_linenumber)), ',') AS lines_str,
           |  list_contains(list(l_linenumber), 3) AS has_line3,
           |  CAST(len(list(l_linenumber)) AS BIGINT) AS n_lines
           |FROM lineitem WHERE l_orderkey < 600
           |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin))

  /** CAST surface (executor.py:106-141): numeric/string/date round-trips.
    * l_quantity is integral so double→BIGINT is exact in both engines.
    */
  val scalarCast = OpQ("op_scalar_cast",
    (s, d) => t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty_int"),
        col("l_linenumber").cast("double").as("ln_d"),
        col("l_orderkey").cast("string").as("key_str"),
        col("l_orderkey").cast("string").cast("long").as("key_roundtrip"),
        col("l_shipdate").cast("date").cast("string").as("ship_day"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(200),
    Some("""SELECT l_orderkey, l_linenumber,
           |  CAST(l_quantity AS BIGINT) AS qty_int,
           |  CAST(l_linenumber AS DOUBLE) AS ln_d,
           |  CAST(l_orderkey AS STRING) AS key_str,
           |  CAST(CAST(l_orderkey AS STRING) AS BIGINT) AS key_roundtrip,
           |  CAST(CAST(l_shipdate AS DATE) AS STRING) AS ship_day
           |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin))

  /** String function library: UPPER/LOWER/LENGTH/CONCAT/REPLACE/TRIM. */
  val scalarStrings = OpQ("op_scalar_strings",
    (s, d) => t(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("snake"))
      .orderBy(col("p_partkey")).limit(200),
    Some("""SELECT p_partkey, UPPER(p_name) AS up, LOWER(p_brand) AS lo,
           |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
           |  CONCAT(p_brand, ':', p_type) AS brand_type,
           |  REPLACE(p_name, ' ', '_') AS snake
           |FROM part ORDER BY p_partkey LIMIT 200""".stripMargin))

  /** Math functions over the IEEE-exact subset: ABS, SQRT, multiply,
    * divide, modulo.
    * EXP/LN/POWER exist in the library but are kept out of the oracle —
    * libm transcendentals differ by 1 ulp between engines on ~1.5% of
    * inputs (observed), as does ROUND (Spark HALF_UP, DuckDB HALF_EVEN).
    */
  val scalarMath = OpQ("op_scalar_math",
    (s, d) => t(s, d, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("dev"),
        sqrt(col("l_quantity")).as("sq"),
        (col("l_extendedprice") * col("l_discount")).as("disc_amt"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
        (col("l_orderkey") % 7).cast("long").as("m7"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).limit(200),
    Some("""SELECT l_orderkey, l_linenumber,
           |  ABS(l_quantity - 25) AS dev, SQRT(l_quantity) AS sq,
           |  l_extendedprice * l_discount AS disc_amt,
           |  l_extendedprice / l_quantity AS unit_price,
           |  CAST(l_orderkey % 7 AS BIGINT) AS m7
           |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200""".stripMargin))

  /** EXTRACT/date_trunc (SURVEY §2.7: EXTRACT(year FROM d)). DuckDB's
    * date_trunc returns DATE where Spark returns TIMESTAMP — both sides
    * normalize through CAST(... AS DATE AS STRING).
    */
  val scalarDates = OpQ("op_scalar_dates",
    (s, d) => t(s, d, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").cast("string").as("month_start"))
      .orderBy(col("o_orderkey")).limit(200),
    Some("""SELECT o_orderkey,
           |  CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
           |  CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
           |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
           |  CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS STRING) AS month_start
           |FROM orders ORDER BY o_orderkey LIMIT 200""".stripMargin))

  // ---- §2.6/§2.8 growth: window functions, rollup, pivot -----------------

  /** Window ranking: top-3 customers per market segment (row_number over
    * partition). No window functions exist in the reference (SURVEY §2.6) —
    * pure growth surface.
    */
  val windowTopkPerGroup = OpQ("op_window_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },
    Some("""SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
           |  SELECT c_mktsegment, c_custkey, c_acctbal,
           |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
           |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
           |  FROM customer) t
           |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin))

  /** Window aggregates: LAG + running sum (exact cents, so the windowed
    * partial sums are order-independent) + row_number.
    */
  val windowRunning = OpQ("op_window_running",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders").filter(col("o_custkey") < 50)
        .select(
          col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          (sum(cents(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double") / 100).as("running_spend"),
          row_number().over(w).as("rn"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
           |      ORDER BY o_orderdate, o_orderkey) AS prev_price,
           |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER (
           |      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
           |    AS running_spend,
           |  ROW_NUMBER() OVER (PARTITION BY o_custkey
           |      ORDER BY o_orderdate, o_orderkey) AS rn
           |FROM orders WHERE o_custkey < 50
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** Full ranking-function suite over one partition spec: rank/dense_rank
    * (ties on c_nationkey), ntile, percent_rank/cume_dist (same
    * integer-ratio double arithmetic in both engines → bit-exact), and
    * first/last value over the full frame (explicit UNBOUNDED FOLLOWING —
    * the default frame would make last_value the current row).
    */
  val windowRankSuite = OpQ("op_window_rank_suite",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "customer").filter(col("c_custkey") <= 200)
        .select(
          col("c_mktsegment"), col("c_custkey"),
          rank().over(Window.partitionBy(col("c_mktsegment")).orderBy(col("c_nationkey"))).as("rnk"),
          dense_rank().over(Window.partitionBy(col("c_mktsegment")).orderBy(col("c_nationkey"))).as("drnk"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"),
          first(col("c_custkey")).over(full).as("first_key"),
          last(col("c_custkey")).over(full).as("last_key"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey,
           |  RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS rnk,
           |  DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS drnk,
           |  NTILE(4) OVER w AS quartile,
           |  PERCENT_RANK() OVER w AS pct_rank,
           |  CUME_DIST() OVER w AS cdist,
           |  FIRST_VALUE(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND UNBOUNDED FOLLOWING) AS first_key,
           |  LAST_VALUE(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND UNBOUNDED FOLLOWING) AS last_key
           |FROM customer WHERE c_custkey <= 200
           |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_nationkey, c_custkey)
           |ORDER BY c_mktsegment, c_custkey""".stripMargin))

  /** ROLLUP grouping sets (subtotal rows carry NULL keys — explicit NULLS
    * FIRST in the oracle's ORDER BY).
    */
  val rollupOp = OpQ("op_rollup",
    (s, d) => t(s, d, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice"), "sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)/100 AS sum_price
           |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin))

  /** CUBE grouping sets — all 2ᵏ subtotal combinations. */
  val cubeOp = OpQ("op_cube",
    (s, d) => t(s, d, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin))

  /** Explicit GROUPING SETS through the SQL engine path (same text runs
    * in both engines).
    */
  val groupingSetsOp = OpQ("op_grouping_sets",
    (s, d) => graft.Tables.sql(s, d,
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin))

  /** RANGE window frame: 30-day trailing spend per customer — the frame
    * is value-based (micros), so results are independent of tie order.
    */
  val windowRangeFrame = OpQ("op_window_range_frame",
    (s, d) => {
      val us30d = 30L * 24 * 3600 * 1000000L
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("us"))
        .rangeBetween(-us30d, 0)
      t(s, d, "orders").filter(col("o_custkey") < 50)
        // parquet NTZ timestamp → TIMESTAMP (UTC session) before epoch math
        .withColumn("us", unix_micros(col("o_orderdate").cast("timestamp")))
        .select(col("o_custkey"), col("o_orderkey"),
          (sum(cents(col("o_totalprice"))).over(w).cast("double") / 100)
            .as("trailing_30d_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
           |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) OVER (
           |    PARTITION BY o_custkey ORDER BY epoch_us(CAST(o_orderdate AS TIMESTAMP))
           |    RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
           |    AS trailing_30d_spend
           |FROM orders WHERE o_custkey < 50
           |ORDER BY o_custkey, o_orderkey""".stripMargin))

  /** PIVOT (DataFrame API) — oracle expressed as CASE sums. */
  val pivotOp = OpQ("op_pivot",
    (s, d) => t(s, d, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(cents(col("l_extendedprice"))))
      .select(col("l_returnflag"),
        (col("F").cast("double") / 100).as("f_price"),
        (col("O").cast("double") / 100).as("o_price"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
           |  CAST(SUM(CASE WHEN l_linestatus = 'F'
           |    THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT) END) AS DOUBLE)/100 AS f_price,
           |  CAST(SUM(CASE WHEN l_linestatus = 'O'
           |    THEN CAST(FLOOR(l_extendedprice * 100) AS BIGINT) END) AS DOUBLE)/100 AS o_price
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  val all: Seq[OpQ] = Seq(
    scanProjectFilterLimit, aggregateGroup, aggregateGlobal, distinctOp,
    countDistinctOp, statsMoments, havingOp,
    joinInner, joinLeft, joinRight, joinFull, joinCross, joinSemi, joinAnti,
    joinExprKeys, joinTheta, joinMultiway,
    sortMultikeyNulls, topKOp, offsetOp,
    setUnion, setUnionAll, setIntersect, setIntersectAll, setExcept, setExceptAll,
    scalarCaseLikeIn, scalarArithNull, scalarNullSafeEq, arrayAggOp,
    scalarCast, scalarStrings, scalarMath, scalarDates,
    windowTopkPerGroup, windowRunning, windowRangeFrame, windowRankSuite,
    rollupOp, cubeOp, groupingSetsOp, pivotOp)
}
