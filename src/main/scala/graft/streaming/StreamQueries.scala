package graft.streaming

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.OpQueries.OpQ

/** Driver queries for the streaming surface, run in batch mode over the
  * events table (the transformations are batch/stream-unified; the
  * streaming execution path is exercised by StreamingSpec with a memory
  * sink). Oracles use DuckDB's date_trunc/epoch_us equivalents.
  */
object StreamQueries {

  private def ev(s: org.apache.spark.sql.SparkSession, d: String) = Tables.load(s, d, "events")

  /** Tumbling 1h windows per event type (window start == date_trunc hour). */
  val tumbling = OpQ("stream_tumbling_window",
    (s, d) => Streams.tumblingCounts(ev(s, d))
      .orderBy(col("win_start"), col("event_type")),
    Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS STRING) AS win_start,
           |  event_type, COUNT(*) AS n,
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin))

  /** Sliding 2h/1h windows: each event lands in the two covering windows. */
  val sliding = OpQ("stream_sliding_window",
    (s, d) => Streams.slidingCounts(ev(s, d))
      .orderBy(col("win_start"), col("event_type")),
    Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP))
           |         - k * INTERVAL 1 HOUR AS STRING) AS win_start,
           |  event_type, COUNT(*) AS n
           |FROM events, UNNEST(range(0, 2)) t(k)
           |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin))

  /** Sessionization (30-min gap) via gaps-and-islands window functions. */
  val sessions = OpQ("stream_sessionize",
    (s, d) => Streams.sessionize(ev(s, d))
      .orderBy(col("user_id"), col("session_id")),
    Some("""WITH marked AS (
           |  SELECT user_id, event_id, ts,
           |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           |    LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
           |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
           |  FROM events),
           |sessioned AS (
           |  SELECT user_id, ts,
           |    SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
           |             THEN 1 ELSE 0 END) OVER
           |      (PARTITION BY user_id ORDER BY us, event_id
           |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           |  FROM marked)
           |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           |  COUNT(*) AS n_events,
           |  CAST(MIN(CAST(ts AS TIMESTAMP)) AS STRING) AS session_start,
           |  CAST(MAX(CAST(ts AS TIMESTAMP)) AS STRING) AS session_end
           |FROM sessioned GROUP BY user_id, session_id
           |ORDER BY user_id, session_id""".stripMargin))

  /** Semi-structured props extraction (regexp over the JSON payload —
    * portable across both engines without a JSON extension).
    */
  val propsExtract = OpQ("stream_props_extract",
    (s, d) => ev(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long").as("k"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id,
           |  CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  /** Exactly-once recovery over at-least-once input: the batch replay of
    * [[Streams.dedupEvents]] — the input is the events table unioned with
    * itself (every event delivered twice), the output must be the original
    * table. The duplicate copies are identical, so the kept-row choice is
    * immaterial and the oracle is exact.
    */
  val dedup = OpQ("stream_dedup",
    (s, d) => {
      val e = ev(s, d)
      Streams.dedupEvents(e.union(e))
        .select(col("event_id"), col("user_id"), col("event_type"),
          floor(col("value") * 100).cast("long").as("value_cents"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, event_type,
           |  CAST(FLOOR(value * 100) AS BIGINT) AS value_cents
           |FROM events ORDER BY event_id""".stripMargin))

  /** Batch replay of the stream-stream interval join
    * ([[Streams.purchaseAttribution]]): purchases × same-user views in the
    * trailing hour. Counts per purchase (not raw pairs) keep the output
    * compact; the oracle is the equivalent DuckDB range join.
    */
  val attribution = OpQ("stream_interval_join",
    (s, d) => Streams.purchaseAttribution(ev(s, d))
      .groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_views"),
        max(col("v_ts")).cast("string").as("last_view_ts"))
      .orderBy(col("p_id")),
    Some("""SELECT p.event_id AS p_id, COUNT(*) AS n_views,
           |  CAST(MAX(CAST(v.ts AS TIMESTAMP)) AS STRING) AS last_view_ts
           |FROM events p JOIN events v
           |  ON p.event_type = 'purchase' AND v.event_type = 'view'
           | AND p.user_id = v.user_id
           | AND CAST(v.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
           | AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
           |GROUP BY p.event_id ORDER BY p_id""".stripMargin))

  /** Batch replay of streaming near-dup dedup ([[Streams.dedupNearDupDocs]])
    * on a doubled documents corpus, gated by a VERIFIABLE self-check
    * rather than rows-only: which of several colliding docs survives is
    * arrival-order-dependent by design, and DuckDB cannot replay XXH64,
    * so the hashed output is the invariant summary that pins the dedup
    * semantics engine-independently —
    *   `n_docs`       exact doubled-corpus size (DuckDB: 2·COUNT(*)),
    *   `hof_ok`       every [[graft.functions.SimHash64]] codegen
    *                  fingerprint equals an INDEPENDENT recomputation
    *                  through the builtin-only HOF fold
    *                  (xxhash64 + aggregate/zip_with majority vote) —
    *                  two disjoint implementations agreeing per row,
    *   `set_ok`       survivor count = distinct-fingerprint count of the
    *                  corpus (dedup keeps exactly one doc per fp),
    *   `coverage_ok`  no corpus fingerprint is missing from the survivor
    *                  set (anti-join empty).
    * The oracle asserts the count and expects TRUE×3. The stream≡batch
    * fingerprint-set equivalence stays gated in StreamingSpec.
    */
  val dedupNearDup = OpQ("stream_dedup_neardup",
    (s, d) => {
      val corpus = Tables.load(s, d, "documents")
        .unionAll(Tables.load(s, d, "documents"))
      val surv = Streams.dedupNearDupDocs(corpus).select(col("simhash"))
      val hofFold = graft.functions.SimHash64.referenceFoldSql("split(text, ' ')")
      val fps = corpus
        .withColumn("simhash",
          graft.functions.SimHash64.simhash64(split(col("text"), " ")))
        .withColumn("fp_hof", expr(hofFold))
      val stats = fps.agg(
        count(lit(1)).as("n_docs"),
        expr("bool_and(simhash = fp_hof)").as("hof_ok"),
        countDistinct(col("simhash")).as("n_distinct"))
      val nSurv = surv.agg(count(lit(1)).as("n_surv"))
      val uncovered = fps.select(col("simhash")).distinct()
        .join(surv, Seq("simhash"), "left_anti")
        .agg(count(lit(1)).as("n_uncovered"))
      stats.crossJoin(broadcast(nSurv)).crossJoin(broadcast(uncovered))
        .select(col("n_docs"), col("hof_ok"),
          (col("n_surv") === col("n_distinct")).as("set_ok"),
          (col("n_uncovered") === lit(0)).as("coverage_ok"))
    },
    Some("""SELECT CAST(2 * COUNT(*) AS BIGINT) AS n_docs, TRUE AS hof_ok,
           |  TRUE AS set_ok, TRUE AS coverage_ok FROM documents""".stripMargin))

  /** Stream-static enrichment ([[Streams.enrichedWindowCounts]]): events
    * joined to the broadcast customer dimension, rolled up per tumbling
    * hour × market segment. Batch replay here; the stream≡batch
    * equivalence (and the per-micro-batch broadcast) is gated by
    * StreamingSpec.
    */
  val staticEnrich = OpQ("stream_static_join",
    (s, d) => Streams.enrichedWindowCounts(
        ev(s, d), Tables.load(s, d, "customer"))
      .orderBy(col("win_start"), col("c_mktsegment")),
    Some("""SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS STRING) AS win_start,
           |  c_mktsegment, COUNT(*) AS n,
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
           |FROM events JOIN customer ON user_id + 1 = c_custkey
           |GROUP BY 1, 2 ORDER BY win_start, c_mktsegment""".stripMargin))

  /** Native `session_window` sessions ([[Streams.sessionWindowCounts]]).
    * Oracle is the gaps-and-islands formulation with the native
    * boundary semantics (an event exactly `gap` after the previous one
    * opens a NEW session, i.e. `diff >= gap`, where a session extends
    * [first, last + gap)).
    */
  val sessionWindow = OpQ("stream_session_window",
    (s, d) => Streams.sessionWindowCounts(ev(s, d))
      .orderBy(col("user_id"), col("session_start")),
    Some("""WITH marked AS (
           |  SELECT user_id, event_id, ts,
           |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           |    LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER
           |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_us
           |  FROM events),
           |sessioned AS (
           |  SELECT user_id, ts,
           |    SUM(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
           |             THEN 1 ELSE 0 END) OVER
           |      (PARTITION BY user_id ORDER BY us, event_id
           |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           |  FROM marked)
           |SELECT user_id,
           |  CAST(MIN(CAST(ts AS TIMESTAMP)) AS STRING) AS session_start,
           |  COUNT(*) AS n_events
           |FROM sessioned GROUP BY user_id, session_id
           |ORDER BY user_id, session_start""".stripMargin))

  /** Batch replay of the LEFT OUTER interval join
    * ([[Streams.purchaseAttributionOuter]]): every purchase appears,
    * view-less ones with n_views = 0 and a NULL last view. `COUNT(v_id)`
    * (null-skipping) gives the zero for free.
    */
  val attributionOuter = OpQ("stream_interval_join_outer",
    (s, d) => Streams.purchaseAttributionOuter(ev(s, d))
      .groupBy(col("p_id"))
      .agg(count(col("v_id")).as("n_views"),
        max(col("v_ts")).cast("string").as("last_view_ts"))
      .orderBy(col("p_id")),
    Some("""SELECT p.event_id AS p_id, COUNT(v.event_id) AS n_views,
           |  CAST(MAX(CAST(v.ts AS TIMESTAMP)) AS STRING) AS last_view_ts
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           |LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           |  ON p.user_id = v.user_id
           | AND CAST(v.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
           | AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
           |GROUP BY p.event_id ORDER BY p_id""".stripMargin))

  /** FULL OUTER interval join ([[Streams.purchaseAttributionFull]]),
    * folded to a per-user match matrix: matched pairs, view-less
    * purchases, and orphan views that never converted. Oracle: the same
    * FULL JOIN with the identical time-range condition in DuckDB.
    */
  val attributionFull = OpQ("stream_interval_join_full",
    (s, d) => Streams.purchaseAttributionFull(ev(s, d))
      .groupBy(coalesce(col("p_user"), col("v_user")).as("user_id"))
      .agg(
        count(when(col("p_id").isNotNull && col("v_id").isNotNull, 1)).as("n_matched"),
        count(when(col("p_id").isNotNull && col("v_id").isNull, 1)).as("n_view_less"),
        count(when(col("p_id").isNull, 1)).as("n_orphan_views"))
      .orderBy(col("user_id")),
    Some("""SELECT COALESCE(p.user_id, v.user_id) AS user_id,
           |  COUNT(CASE WHEN p.event_id IS NOT NULL AND v.event_id IS NOT NULL
           |        THEN 1 END) AS n_matched,
           |  COUNT(CASE WHEN p.event_id IS NOT NULL AND v.event_id IS NULL
           |        THEN 1 END) AS n_view_less,
           |  COUNT(CASE WHEN p.event_id IS NULL THEN 1 END) AS n_orphan_views
           |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           |FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
           |  ON p.user_id = v.user_id
           | AND CAST(v.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
           | AND CAST(v.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
           |GROUP BY 1 ORDER BY user_id""".stripMargin))

  /** Windowed approximate distinct users ([[Streams.approxUserCounts]]),
    * tolerance-oracled: the HLL estimate itself is engine-specific, so
    * the hashed row is the exact per-window event count + exact distinct
    * users (both bit-comparable) and a boolean asserting the sketch is
    * within max(5% of exact, 2) — hourly windows here hold only ~15
    * distinct users, where a ±1 HLL wobble exceeds any pure relative
    * band; the oracle recomputes the exacts and expects TRUE. The
    * stream≡batch identity stays a StreamingSpec gate.
    */
  val approxUsers = OpQ("stream_approx_users",
    (s, d) => {
      val exact = ev(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .select(col("window.start").cast("string").as("win_start"), col("exact_users"))
      Streams.approxUserCounts(ev(s, d))
        .join(exact, "win_start")
        .select(col("win_start"), col("n_events"), col("exact_users"),
          (abs(col("n_users_approx") - col("exact_users")).cast("double") <=
            greatest(lit(0.05) * col("exact_users").cast("double"), lit(2.0)))
            .as("within_tol"))
        .orderBy(col("win_start"))
    },
    Some("""SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS win_start,
           |  CAST(COUNT(*) AS BIGINT) AS n_events,
           |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           |  TRUE AS within_tol
           |FROM events GROUP BY 1 ORDER BY win_start""".stripMargin))

  /** Streaming per-hour top-3 users ([[Streams.topUsersStateful]]):
    * Misra–Gries-bounded state, exact below capacity, so the batch
    * replay matches the plain windowed-rank SQL bit-for-bit. The
    * stream-mode equivalence is a StreamingSpec gate.
    */
  val topUsers = OpQ("stream_topk_users",
    (s, d) => Streams.topUsersStateful(s, ev(s, d))
      .select(col("hour_us"), col("rank"), col("user_id"), col("n"))
      .orderBy(col("hour_us"), col("rank")),
    Some("""WITH c AS (
           |  SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS hour_us,
           |    user_id, COUNT(*) AS n
           |  FROM events GROUP BY 1, 2),
           |r AS (SELECT hour_us, user_id, n,
           |        CAST(row_number() OVER (PARTITION BY hour_us
           |          ORDER BY n DESC, user_id) AS BIGINT) AS rank
           |      FROM c)
           |SELECT hour_us, rank, user_id, n FROM r WHERE rank <= 3
           |ORDER BY hour_us, rank""".stripMargin))

  /** Gap analysis ([[Streams.gapsBatch]]): in-data silences > 2h per
    * user as lag pairs — the SQL-oracleable twin of the streaming
    * event-time-timeout silence detector
    * ([[Streams.silenceDetectStateful]], StreamingSpec-gated).
    */
  val gapDetect = OpQ("stream_gap_detect",
    (s, d) => Streams.gapsBatch(ev(s, d))
      .orderBy(col("user_id"), col("prev_ts")),
    Some("""WITH g AS (
           |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
           |    LAG(CAST(ts AS TIMESTAMP), 1) OVER
           |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
           |  FROM events)
           |SELECT user_id, CAST(prev AS STRING) AS prev_ts,
           |  CAST(ts AS STRING) AS next_ts,
           |  (epoch_us(ts) - epoch_us(prev)) // 60000000 AS gap_minutes
           |FROM g WHERE prev IS NOT NULL
           |  AND epoch_us(ts) - epoch_us(prev) > CAST(7200000000 AS BIGINT)
           |ORDER BY user_id, prev_ts""".stripMargin))

  /** Streaming CDC materialization ([[Streams.cdcLatestStateful]]) run in
    * batch mode: the events feed becomes an I/U/D change stream (signup →
    * insert, error → delete-tombstone, else update; seq = event_id), and
    * the operator folds it to the latest change per user — tombstones
    * included. Oracle is the window-function spelling of the same
    * latest-by-seq.
    */
  val cdcLatest = OpQ("stream_cdc_apply",
    (s, d) => Streams.cdcLatestStateful(s, ev(s, d).select(
        col("user_id").as("key"), col("event_id").as("seq"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        floor(col("value") * 100).cast("long").as("val_cents")))
      .orderBy(col("key")),
    Some("""WITH chg AS (
           |  SELECT user_id AS key, event_id AS seq,
           |    CASE WHEN event_type = 'signup' THEN 'I'
           |         WHEN event_type = 'error' THEN 'D'
           |         ELSE 'U' END AS op,
           |    CAST(FLOOR(value * 100) AS BIGINT) AS val_cents
           |  FROM events)
           |SELECT key, seq, op, val_cents FROM (
           |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
           |  FROM chg) WHERE rn = 1 ORDER BY key""".stripMargin))

  /** Incremental tokenizer fertility (r14 —
    * [[Streams.tokenizerFertilityIncremental]]'s merge path in batch
    * mode): the documents corpus is split into three disjoint
    * "micro-batch" slices by doc_id, each reduced to its per-language
    * partial counters, folded through [[Streams.fertilityMergeCounts]]
    * one slice at a time exactly as foreachBatch does, and the report
    * derived from the merged state. Counter merging is a per-language
    * sum — associative — so the oracle is the SAME whole-corpus DuckDB
    * replay as `llm_tokenizer_fertility`; the real micro-batch
    * execution (file stream, one file per trigger) is gated in
    * StreamingSpec.
    */
  val tokenizerFertility = OpQ("stream_tokenizer_fertility",
    (s, d) => {
      val corpus = Tables.load(s, d, "documents")
      val slices = (0 until 3).map(i =>
        graft.llm.TextAnalysis.tokenizerFertilityCounts(
          corpus.filter(pmod(col("doc_id"), lit(3)) === i)))
      val merged = slices.tail.foldLeft(slices.head)(
        (state, partial) => Streams.fertilityMergeCounts(Some(state), partial))
      graft.llm.TextAnalysis.tokenizerFertilityReport(merged)
    },
    Some(graft.llm.LlmQueries.tokenizerFertilityOracleSql))

  val all: Seq[OpQ] = Seq(tumbling, sliding, sessions, propsExtract, dedup,
    attribution, dedupNearDup, staticEnrich, sessionWindow, attributionOuter,
    attributionFull, approxUsers, topUsers, gapDetect, cdcLatest,
    tokenizerFertility)
}
