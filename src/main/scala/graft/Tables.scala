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
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects; read nanos as long and truncate to micros
    // (DuckDB's CAST(ts_ns AS TIMESTAMP) truncates identically).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      import org.apache.spark.sql.functions._
      // integer division — double division would lose precision at ~1e18 ns
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else df
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
  def register(spark: SparkSession, dir: String): Unit = {
    if (registered.get(spark) != dir) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir) // only cache after every view registered
    }
  }

  /** Register views then run one SQL statement through the engine. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    Engine.execute(spark, query)
  }
}
