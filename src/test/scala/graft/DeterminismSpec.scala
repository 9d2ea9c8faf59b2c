package graft

/** Suite-wide partition-invariance gate: EVERY driver query must produce
  * bit-identical results whatever the shuffle fan-out — the property that
  * makes results reproducible when a cluster resizes, AQE re-plans, or a
  * 100 TB run lands on different executor counts than the dev box. The
  * engine earns this by construction (exact integer arithmetic for every
  * aggregate that feeds a comparison, total orders under every LIMIT,
  * associative merge states); this spec checks the whole query map
  * instead of trusting the per-operator specs to have covered each new
  * addition.
  *
  * Method: run each query at sf0.001 under shuffle.partitions=3 and =17
  * (coprime, both ≠ the suite default), canonicalize rows to sorted
  * string form, and require equality. Binary/array/map cells render via
  * Row.toString — stable within a session, which is all the comparison
  * needs. Queries are CONSTRUCTED after each conf change (the fn builds
  * a fresh plan, so the setting is honored at planning time).
  */
class DeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toString).sorted.toSeq

  test("every driver query is partition-invariant at sf0.001", SlowTest) {
    initLog()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    queries.foreach { case (name, fn) =>
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val a = canon(fn(spark, sfDir).collect())
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        val b = canon(fn(spark, sfDir).collect())
        if (a != b)
          failures += s"$name: ${a.size} vs ${b.size} rows" +
            a.zip(b).find { case (x, y) => x != y }
              .map { case (x, y) => s"; first diff:\n  p3:  $x\n  p17: $y" }
              .getOrElse("")
      } catch {
        case e: Throwable => failures += s"$name: CRASH ${e.getMessage}"
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", "4")
      }
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
