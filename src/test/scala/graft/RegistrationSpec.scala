package graft

import org.apache.spark.sql.functions._

/** Registration-path regression gate (VERDICT r8 item 3): the round-8
  * breakage — a testdata schema change in ONE table (`events.ts` went
  * TIMESTAMP(NANOS)→TIMESTAMP(MICROS)) crashing ALL `Tables.sql`-routed
  * queries at eager view registration — must be a red test before commit,
  * not a post-hoc verdict finding.
  *
  * These tests run against the DRIVER'S actual testdata layout, not a
  * synthesized fixture, so any generator-side schema drift lands here
  * first. One query per routing family: TPC-H (SQL text through
  * `Tables.sql`), dialect (transpile → `Tables.sql`), events-reading
  * op_*, and streaming batch-replay.
  */
class RegistrationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Tables.register registers all ten views from the driver testdata") {
    initLog()
    Tables.register(spark, dir)
    Tables.all.foreach { n =>
      assert(spark.catalog.tableExists(n), s"view '$n' missing after register")
      // force full analysis of the view body, not just catalog presence
      assert(spark.table(n).schema.nonEmpty, s"view '$n' has no schema")
    }
  }

  test("events ts normalizes to TimestampType for any generator version") {
    initLog()
    val df = Tables.load(spark, dir, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType,
      s"ts is ${df.schema("ts").dataType}, want session-zoned TimestampType")
    // values must be sane wall-clock instants, not mis-scaled epochs
    val (lo, hi) = {
      val r = df.agg(min(year(col("ts"))), max(year(col("ts")))).head()
      (r.getInt(0), r.getInt(1))
    }
    assert(lo >= 1990 && hi <= 2100, s"ts years out of range: [$lo,$hi]")
  }

  test("one query per routing family analyzes and returns rows") {
    initLog()
    // TPC-H: SQL text through Tables.sql/Engine.execute
    assert(Tables.sql(spark, dir, TpchQueries.q1.spark).count() > 0, "q1")
    // dialect: transpiled SQL through the same route
    val dialectQ = ops.DialectQueries.all.head
    assert(dialectQ.fn(spark, dir).count() > 0, s"dialect ${dialectQ.name}")
    // events-reading operator query
    val evQ = streaming.StreamQueries.all.head
    assert(evQ.fn(spark, dir).count() > 0, s"stream ${evQ.name}")
  }

  test("register survives one broken table and still serves the other nine") {
    initLog()
    // stage a layout where exactly one table is unreadable garbage
    val d = java.nio.file.Files.createTempDirectory("graft_reg").toString
    Tables.all.foreach { n =>
      val src = java.nio.file.Paths.get(s"$dir/$n.parquet")
      val dst = java.nio.file.Paths.get(s"$d/$n.parquet")
      if (n == "events")
        java.nio.file.Files.writeString(dst, "not a parquet file")
      else java.nio.file.Files.copy(src, dst)
    }
    Tables.register(spark, d)
    assert(spark.sql("SELECT count(*) FROM nation").head().getLong(0) > 0,
      "unrelated table must survive a broken sibling")
    assert(!spark.catalog.tableExists("events"),
      "broken table must not leave a stale/bogus view")
    // registration was NOT cached (failures present) — a later register
    // with a good dir must fully recover, including the broken table
    Tables.register(spark, dir)
    assert(spark.sql("SELECT count(*) FROM events").head().getLong(0) > 0,
      "recovery register must restore the previously-broken view")
  }

  test("nanos->micros normalization FLOORS pre-epoch timestamps (DuckDB cast parity)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // -1500 ns: truncation toward zero gives -1 us; DuckDB's CAST floors
    // to -2 us. 2500 ns floors to 2 us on both.
    val df = Seq(-1500L, -1000L, 2500L).toDF("ts")
    val got = Tables.normalizeEventTs(df)
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(-2L, -1L, 2L))
  }
}
