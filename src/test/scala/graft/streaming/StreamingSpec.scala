package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming execution: the same transformations the driver
  * checks in batch must produce identical results when run as a stream
  * (file source → memory sink), plus the stateful
  * flatMapGroupsWithState path.
  */
class StreamingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The file stream source needs a directory; stage the single events
    * parquet into one (models files arriving in a landing dir).
    */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      java.nio.file.Paths.get(s"$d/events.parquet"))
    d
  }

  test("tumblingCounts: streaming result equals batch result") {
    initLog()
    val batch = Streams.tumblingCounts(graft.Tables.load(spark, dir, "events"))
    val stream = Streams.tumblingCounts(Streams.readEventsStream(spark, streamDir))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("tumbling_out")
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stream and batch disagree")
    assert(got.count() > 0)
  }

  test("enrichedWindowCounts: stream-static broadcast join equals batch") {
    initLog()
    val dim = graft.Tables.load(spark, dir, "customer")
    val batch = Streams.enrichedWindowCounts(
      graft.Tables.load(spark, dir, "events"), dim)
    val stream = Streams.enrichedWindowCounts(
      Streams.readEventsStream(spark, streamDir), dim)
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enrich_out")
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stream and batch disagree")
    assert(got.count() > 0)
  }

  test("sessionWindowCounts: append-mode stream emits a correct subset of batch sessions") {
    initLog()
    val batch = Streams.sessionWindowCounts(
      graft.Tables.load(spark, dir, "events")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val stream = Streams.sessionWindowCounts(Streams.readEventsStream(spark, streamDir))
    val q = stream.writeStream
      .outputMode("append") // session state evicts as the watermark passes
      .format("memory").queryName("session_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("session_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // sessions still open at the final watermark are withheld by design;
    // everything that DID emit must be byte-identical to a batch session
    assert(got.nonEmpty, "no sessions emitted")
    assert(got.subsetOf(batch), s"streamed sessions not in batch: ${got.diff(batch).take(3)}")
  }

  test("foreachBatch parquet sink: replay is idempotent (overwrite by batch id)") {
    initLog()
    val out = java.nio.file.Files.createTempDirectory("graft_fbsink").toString
    def runOnce(): Unit = {
      val q = Streams.readEventsStream(spark, streamDir)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          // deterministic per-batch dir + overwrite = exactly-once on replay
          batch.write.mode("overwrite").parquet(s"$out/batch=$id")
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    val first = spark.read.parquet(s"$out/batch=0").count()
    runOnce() // no checkpoint → same input replays as batch 0 and overwrites
    val second = spark.read.parquet(s"$out/batch=0").count()
    val expected = graft.Tables.load(spark, dir, "events").count()
    assert(first === expected && second === expected,
      s"sink not idempotent: $first then $second, want $expected")
  }

  test("tokenizerFertilityIncremental: merged micro-batch counters equal batch fertility") {
    initLog()
    // three landing files = three micro-batches (maxFilesPerTrigger=1),
    // so the merge path really runs incrementally
    val d = java.nio.file.Files.createTempDirectory("graft_docs_fert").toString
    val docs = graft.Tables.load(spark, dir, "documents")
    (0 until 3).foreach { i =>
      docs.filter(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(s"$d/slice=$i")
    }
    val landing = java.nio.file.Files.createTempDirectory("graft_docs_land").toString
    (0 until 3).foreach { i =>
      val src = new java.io.File(s"$d/slice=$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(s"$landing/docs_$i.parquet"))
    }
    val stateDir = java.nio.file.Files.createTempDirectory("graft_fert_state").toString
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
    val q = Streams.tokenizerFertilityIncremental(stream, stateDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // retention (r15): after 3 micro-batches only the newest 2 versions
    // remain — the state dir is O(1) for any stream age (the retained
    // second-newest is the retry-merge base), and the newest must be the
    // last batch's
    val versions = new java.io.File(stateDir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
    assert(versions.length <= 2 && versions.nonEmpty,
      s"expected <= 2 retained state versions after 3 batches, got ${versions.length}")
    assert(versions.map(_.getName.drop(1).toLong).max === 2L,
      "newest retained version is not the final micro-batch's")
    val got = Streams.tokenizerFertilityCurrent(spark, stateDir)
    val want = graft.llm.TextAnalysis.tokenizerFertility(docs)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "incremental fertility state diverges from the batch aggregate")
    assert(got.count() > 0)
  }

  test("dedupNearDupDocs: streaming fingerprint set equals the batch near-dup set") {
    initLog()
    // doubled documents landing dir = every document delivered twice
    val d = java.nio.file.Files.createTempDirectory("graft_docs_dup").toString
    Seq("documents.parquet", "documents_replay.parquet").foreach { name =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/documents.parquet"),
        java.nio.file.Paths.get(s"$d/$name"))
    }
    val q = Streams.dedupNearDupDocs(Streams.readDocumentsStream(spark, d))
      .select(hex(col("simhash")).as("fp"))
      .writeStream
      .outputMode("append")
      .format("memory").queryName("neardup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("neardup_out")
    val batch = Streams.dedupNearDupDocs(graft.Tables.load(spark, dir, "documents"))
      .select(hex(col("simhash")).as("fp"))
    // the fingerprint SET is deterministic (survivor choice is not)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // and it actually deduplicates: the corpus contains exact/near dups
    val total = graft.Tables.load(spark, dir, "documents").count()
    assert(streamed.count() < total)
  }

  test("dedupEvents: duplicated stream input collapses to the batch distinct set") {
    initLog()
    // two copies of the same file in the landing dir = every event
    // delivered twice (at-least-once replay)
    val d = java.nio.file.Files.createTempDirectory("graft_events_dup").toString
    Seq("events.parquet", "events_replay.parquet").foreach { name =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        java.nio.file.Paths.get(s"$d/$name"))
    }
    val q = Streams.dedupEvents(Streams.readEventsStream(spark, d))
      .select(col("event_id"))
      .writeStream
      .outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val batchDistinct = graft.Tables.load(spark, dir, "events")
      .select("event_id").distinct().count()
    assert(spark.table("dedup_out").count() === batchDistinct)
    assert(spark.table("dedup_out").distinct().count() === batchDistinct)
  }

  test("purchaseAttribution: stream-stream interval join equals batch") {
    initLog()
    val stream = Streams.purchaseAttribution(Streams.readEventsStream(spark, streamDir))
    assert(stream.isStreaming)
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("attr_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_out")
    val batch = Streams.purchaseAttribution(graft.Tables.load(spark, dir, "events"))
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "stream-stream join and batch range join disagree")
  }

  test("purchaseAttributionOuter: streamed rows ⊆ batch; settled null-matches all emit") {
    initLog()
    val batchDf = Streams.purchaseAttributionOuter(
      graft.Tables.load(spark, dir, "events"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3)) // (p_id, v_id|null)
    val batch = batchDf.collect().map(key).toSet
    val maxTs = graft.Tables.load(spark, dir, "events")
      .agg(max(col("ts"))).head().getTimestamp(0).getTime
    val stream = Streams.purchaseAttributionOuter(Streams.readEventsStream(spark, streamDir))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("attr_outer_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val gotRows = spark.table("attr_outer_out").collect()
    val got = gotRows.map(key).toSet
    assert(got.nonEmpty && got.subsetOf(batch), s"streamed-not-in-batch: ${got.diff(batch).take(3)}")
    // null-matched purchases emit once the final watermark clears their
    // window: every batch null-match 3h+ before the last event must appear
    val settledNulls = batchDf.filter(col("v_id").isNull)
      .filter(col("p_ts") < new java.sql.Timestamp(maxTs - 3 * 3600 * 1000L))
      .collect().map(key).toSet
    assert(settledNulls.nonEmpty, "fixture should contain settled view-less purchases")
    assert(settledNulls.subsetOf(got),
      s"withheld settled null-matches: ${settledNulls.diff(got).take(3)}")
  }

  test("purchaseAttributionFull: streamed rows ⊆ batch; both null sides emit when settled") {
    initLog()
    val batchDf = Streams.purchaseAttributionFull(
      graft.Tables.load(spark, dir, "events"))
    def key(r: org.apache.spark.sql.Row) =
      (if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3)) // (p_id|null, v_id|null)
    val batch = batchDf.collect().map(key).toSet
    val maxTs = graft.Tables.load(spark, dir, "events")
      .agg(max(col("ts"))).head().getTimestamp(0).getTime
    val stream = Streams.purchaseAttributionFull(Streams.readEventsStream(spark, streamDir))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory").queryName("attr_full_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("attr_full_out").collect().map(key).toSet
    assert(got.nonEmpty && got.subsetOf(batch), s"streamed-not-in-batch: ${got.diff(batch).take(3)}")
    // settled unmatched rows on BOTH sides must have emitted: anything
    // whose join window closed 3h+ before the last event
    val settled = new java.sql.Timestamp(maxTs - 3 * 3600 * 1000L)
    val settledNullViews = batchDf.filter(col("v_id").isNull)
      .filter(col("p_ts") < settled).collect().map(key).toSet
    val settledNullPurchases = batchDf.filter(col("p_id").isNull)
      .filter(col("v_ts") < settled).collect().map(key).toSet
    assert(settledNullViews.nonEmpty && settledNullPurchases.nonEmpty,
      "fixture should contain settled unmatched rows on both sides")
    assert(settledNullViews.subsetOf(got),
      s"withheld settled view-less purchases: ${settledNullViews.diff(got).take(3)}")
    assert(settledNullPurchases.subsetOf(got),
      s"withheld settled orphan views: ${settledNullPurchases.diff(got).take(3)}")
  }

  test("runningCountsStateful: per-user totals accumulate to batch counts") {
    val events = Streams.readEventsStream(spark, streamDir)
    val q = Streams.runningCountsStateful(spark, events, evictIdleState = false).writeStream
      .outputMode("update")
      .format("memory").queryName("stateful_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // last update per user == total batch count per user
    val last = spark.sql(
      """SELECT user_id, MAX(n) AS n FROM stateful_out GROUP BY user_id""")
    val batch = graft.Tables.load(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(last.exceptAll(batch).isEmpty && batch.exceptAll(last).isEmpty)
  }

  test("approxUserCounts: stream equals batch exactly; sketch within rsd of exact") {
    initLog()
    val events = graft.Tables.load(spark, dir, "events")
    val batch = Streams.approxUserCounts(events)
    val stream = Streams.approxUserCounts(Streams.readEventsStream(spark, streamDir))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory").queryName("approx_users_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("approx_users_out")
    // HLL merges are order-independent → stream must be IDENTICAL to batch
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "HLL stream/batch results diverge")
    // and the sketch must track the exact per-window distinct count
    val exact = events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .select(col("window.start").cast("string").as("win_start"), col("n_exact"))
    val joined = got.join(exact, "win_start").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (approx, ex) = (r.getAs[Long]("n_users_approx"), r.getAs[Long]("n_exact"))
      assert(math.abs(approx - ex).toDouble / math.max(ex, 1L) <= 0.15,
        s"window ${r.getString(0)}: approx=$approx exact=$ex")
    }
  }

  test("RocksDB state store: windowed aggregation matches batch (off-heap state tier)") {
    initLog()
    // the production state backend for state larger than executor heap —
    // same query, provider swapped by config, results must be identical
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batch = Streams.tumblingCounts(graft.Tables.load(spark, dir, "events"))
      val stream = Streams.tumblingCounts(Streams.readEventsStream(spark, streamDir))
      val q = stream.writeStream
        .outputMode("complete")
        .format("memory").queryName("rocksdb_out")
        .trigger(Trigger.AvailableNow())
        .start()
      q.processAllAvailable(); q.stop()
      val got = spark.table("rocksdb_out")
      assert(got.count() > 0)
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
        "RocksDB-backed stream disagrees with batch")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("sessionize assigns increasing session ids within a user") {
    val out = Streams.sessionize(graft.Tables.load(spark, dir, "events")).collect()
    assert(out.nonEmpty)
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    byUser.foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("session_id")).sorted
      assert(ids.head == 1L && ids.toSeq == (1L to ids.length).toSeq)
    }
  }

  test("topUsersStateful: stream's final emission per hour equals batch top-k") {
    val events = graft.Tables.load(spark, dir, "events")
    val batch = Streams.topUsersStateful(spark, events)
    val q = Streams.topUsersStateful(spark, Streams.readEventsStream(spark, streamDir))
      .writeStream
      .outputMode("update")
      .format("memory").queryName("topk_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    // the LAST emission per hour (max observed count per rank slot) must
    // equal the batch replay: AvailableNow may process the hour across
    // several micro-batches, each emitting an interim top-k
    val last = spark.sql(
      """SELECT hour_us, rank, user_id, n FROM (
        |  SELECT *, row_number() OVER (PARTITION BY hour_us, rank
        |    ORDER BY n DESC, user_id) AS rn
        |  FROM topk_out) WHERE rn = 1""".stripMargin)
    assert(last.count() > 0)
    assert(last.exceptAll(batch).isEmpty && batch.exceptAll(last).isEmpty,
      "stream top-k disagrees with batch replay")
  }

  test("silenceDetectStateful: event-time timeout fires when the watermark passes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val events = in.toDF().toDF("user_id", "ts")
    val q = Streams.silenceDetectStateful(spark, events, gapMinutes = 60)
      .writeStream.outputMode("append")
      .format("memory").queryName("silence_out")
      .start()
    try {
      // UTC-instant construction (valueOf parses in the JVM default zone,
      // which would shift the emitted UTC strings on non-UTC hosts)
      def utc(iso: String) = java.sql.Timestamp.from(java.time.Instant.parse(iso))
      val t0 = utc("2024-01-01T10:00:00Z")
      // batch 1: users 1 and 2 both alive at t0
      in.addData((1L, t0), (2L, t0))
      q.processAllAvailable()
      assert(spark.table("silence_out").isEmpty, "nothing may time out yet")
      // batch 2: only user 2 speaks again, 5h later — the watermark
      // (max event time − 10 min) passes user 1's t0+60min deadline
      in.addData((2L, utc("2024-01-01T15:00:00Z")))
      q.processAllAvailable()
      // one more batch so the timeout (evaluated against the advanced
      // watermark) gets a micro-batch to fire in
      in.addData((2L, utc("2024-01-01T15:01:00Z")))
      q.processAllAvailable()
      val got = spark.table("silence_out").collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(got.toSeq.map(_._1) === Seq(1L),
        s"expected exactly user 1 silent, got ${got.toSeq}")
      assert(got.head._2.startsWith("2024-01-01 10:00:00"),
        s"silence anchored at the last seen event, got ${got.head._2}")
    } finally q.stop()
  }

  test("cdcLatestStateful: stream's final emission per key equals batch, tombstones emitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val changes = Seq(
      (1L, 1L, "I", 100L), (1L, 3L, "U", 150L), // key 1 ends updated
      (2L, 2L, "I", 200L), (2L, 5L, "D", 0L), // key 2 ends tombstoned
      (3L, 4L, "I", 300L)) // key 3 untouched after insert
    val batch = Streams.cdcLatestStateful(spark,
      changes.toDF("key", "seq", "op", "val_cents")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap

    val in = MemoryStream[(Long, Long, String, Long)]
    val q = Streams.cdcLatestStateful(spark,
        in.toDF().toDF("key", "seq", "op", "val_cents"))
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_out")
      .start()
    try {
      // out-of-key-order across micro-batches: the late batch carries an
      // EARLIER seq for key 1 — the fold must keep seq 3
      in.addData((1L, 1L, "I", 100L), (2L, 2L, "I", 200L))
      q.processAllAvailable()
      in.addData((1L, 3L, "U", 150L), (2L, 5L, "D", 0L), (3L, 4L, "I", 300L))
      q.processAllAvailable()
      in.addData((1L, 2L, "U", 999L)) // stale change: must NOT win
      q.processAllAvailable()
      val last = spark.sql(
        """SELECT key, seq, op, val_cents FROM (
          |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
          |  FROM cdc_out) WHERE rn = 1""".stripMargin).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
      assert(last === batch)
      assert(last(2L) === ((5L, "D", 0L)), "tombstone must be the key's final state")
      assert(last(1L) === ((3L, "U", 150L)), "stale late change must not override")
    } finally q.stop()
  }

  test("topUsersStateful: Misra-Gries keeps a dominant key under overflow") {
    import spark.implicits._
    // 1 hour of data: user 7 appears 60x, 200 distinct one-shot users,
    // capacity 16 forces constant decrements — the heavy hitter survives
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = (1 to 60).map(i => (base, 7L)) ++ (1L to 200L).map(u => (base, 100 + u))
    val df = rows.toDF("ts", "user_id")
    val got = Streams.topUsersStateful(spark, df, k = 1, capacity = 16).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("user_id") === 7L, s"heavy hitter lost: ${got.head}")
  }
}
