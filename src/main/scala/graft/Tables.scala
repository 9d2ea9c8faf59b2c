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
    // The legacy flag is scoped to the events table: setting it for every
    // load would silently change TIMESTAMP(NANOS) read semantics for the
    // user's OWN spark.read calls in the same session. It must stay set
    // while events plans/executes (the reader consults it lazily), so it
    // is not restored — but only the one table that needs it flips it.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
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

  /** Register every test table as a temp view over `dir`. Cached: views
    * are only (re)created when the session's current dir changes —
    * registration is metadata-only, but avoiding 10 parquet-footer
    * re-reads per query matters when the driver runs the whole query map
    * back-to-back.
    */
  def register(spark: SparkSession, dir: String): Unit = registered.synchronized {
    // the whole check-then-register sequence is one critical section:
    // two threads registering different dirs would otherwise interleave
    // their per-table loops and leave the views a MIX of both dirs while
    // the cache claims one dir is fully live
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
