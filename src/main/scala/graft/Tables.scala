package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table registry: loads the driver's parquet tables (TESTDATA.md)
  * and registers them as temp views so both [[Engine.execute]] SQL and the
  * DataFrame-API operator library see the same catalog.
  *
  * Scale note: `spark.read.parquet(...)` is metadata-only; registration costs
  * nothing. Parquet scans get filter pushdown + column pruning from Catalyst,
  * so every query here reads only the columns/row-groups it needs — the same
  * property that makes the plan viable at 100 TB.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet has shipped `ts` as TIMESTAMP(NANOS) (which Spark's
    // vectorized reader only accepts as long via nanosAsLong) and as
    // TIMESTAMP(MICROS) depending on the generator version — dispatch on
    // the type the footer actually declares rather than assuming either.
    // Probe-first: a plain read succeeds for MICROS footers and the
    // session-global legacy flag never flips; only a footer Spark
    // rejects outright (the NANOS case) sets it. It must then stay set
    // while events plans/executes (the reader consults it lazily), so it
    // is not restored — the probe keeps the flip to the one footer
    // layout that needs it instead of every session that loads events.
    val path = s"$dir/$name.parquet"
    if (name == "events") {
      val probed =
        try spark.read.parquet(path)
        catch {
          // ONLY the NANOS-footer rejection ([PARQUET_TYPE_ILLEGAL],
          // verified against Spark 4.1) takes the flagged retry — a
          // missing path or transient I/O error must propagate without
          // flipping the session-global conf
          case e: org.apache.spark.sql.AnalysisException
              if isNanosFooterRejection(e) =>
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            spark.read.parquet(path)
        }
      normalizeEventTs(probed)
    } else spark.read.parquet(path)
  }

  /** The NANOS-footer rejection, identified by ERROR CLASS — formatted
    * message text is brittle across Spark versions/locales; fall back to
    * message matching only when the throwable carries no class (the
    * pre-error-class legacy constructor path).
    */
  private[graft] def isNanosFooterRejection(
      e: org.apache.spark.sql.AnalysisException): Boolean = {
    val cls = e.getCondition
    if (cls != null) cls == "PARQUET_TYPE_ILLEGAL"
    else e.getMessage != null && e.getMessage.contains("PARQUET_TYPE_ILLEGAL")
  }

  /** Normalize the `ts` column to session-zoned TimestampType regardless of
    * how the parquet file declared it. With the session timezone pinned to
    * UTC (every entrypoint does), NTZ→LTZ is value-preserving, and the
    * nanos path truncates to micros exactly like DuckDB's
    * CAST(ts_ns AS TIMESTAMP).
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // nanos-as-long: FLOOR division in exact integer arithmetic —
      // double division would lose precision at ~1e18 ns, and a plain
      // `div` truncates toward zero, shifting pre-1970 timestamps with
      // sub-microsecond nanos 1 µs late vs DuckDB's CAST (which floors)
      case LongType => df.withColumn("ts",
        timestamp_micros(expr("(ts - pmod(ts, 1000L)) div 1000")))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df // already TimestampType
    }
  }

  // Keyed by session identity via WeakHashMap: identityHashCode is not
  // unique, and a weak key lets a stopped session's entry be collected.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  // Per-session lock objects: temp views are per-session state, so only
  // same-session registrations need to serialize. A single global monitor
  // around the ten-footer load loop would make session B's registration
  // wait out session A's parquet I/O for no correctness gain.
  private val regLocks = new java.util.WeakHashMap[SparkSession, Object]()
  private def regLock(spark: SparkSession): Object = regLocks.synchronized {
    var l = regLocks.get(spark)
    if (l == null) { l = new Object; regLocks.put(spark, l) }
    l
  }

  /** Register every test table as a temp view over `dir`. Cached: views
    * are only (re)created when the session's current dir changes —
    * registration is metadata-only, but avoiding 10 parquet-footer
    * re-reads per query matters when the driver runs the whole query map
    * back-to-back.
    */
  def register(spark: SparkSession, dir: String): Unit = regLock(spark).synchronized {
    // the whole check-then-register sequence is one critical section PER
    // SESSION: two threads registering different dirs into the same
    // session would otherwise interleave their per-table loops and leave
    // the views a MIX of both dirs while the cache claims one dir is
    // fully live; independent sessions proceed in parallel
    if (registered.get(spark) != dir) {
      // Invalidate BEFORE mutating views: if this registration fails
      // partway, the cache must not claim the previous dir is still live.
      registered.remove(spark)
      // Per-table isolation: one table failing analysis (e.g. a testdata
      // schema drift) must not take down queries over the other nine. The
      // failure resurfaces only when a query actually references the table.
      val failures = all.flatMap { n =>
        try { load(spark, dir, n).createOrReplaceTempView(n); None }
        catch { case scala.util.control.NonFatal(e) => Some(n -> e) }
      }
      if (failures.isEmpty) registered.put(spark, dir) // cache only when all ten registered
      else {
        failures.foreach { case (n, e) =>
          System.err.println(s"graft.Tables: failed to register '$n' from $dir: ${e.getMessage}")
          spark.catalog.dropTempView(n) // stale view from a previous dir would be wrong
        }
      }
    }
  }

  /** Register views then run one SQL statement through the engine. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    Engine.execute(spark, query)
  }
}
