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
  * string form, and require equality. Cells canonicalize by VALUE —
  * Array[Byte] renders as hex and nested seqs/maps recurse — because
  * Row.toString would stringify binary cells by object identity
  * ([B@…), failing the gate on bit-identical results the moment a
  * query surfaces a raw sketch/binary column. Queries are CONSTRUCTED
  * after each conf change (the fn builds a fresh plan, so the setting
  * is honored at planning time).
  */
class DeterminismSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def cellStr(v: Any): String = v match {
    case null => "NULL"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case a: Array[_] => a.map(cellStr).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(cellStr).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${cellStr(k)}->${cellStr(x)}" }.toSeq.sorted.mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => rowStr(r)
    case other => other.toString
  }
  private def rowStr(r: org.apache.spark.sql.Row): String =
    r.toSeq.map(cellStr).mkString("(", "|", ")")

  private def canon(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(rowStr).sorted.toSeq

  test("every driver query is partition-invariant at sf0.001", SlowTest) {
    initLog()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // restore whatever the shared session actually ran with (the session
    // outlives this suite), not a re-hardcoded copy of SparkSpec's default
    val prevPartitions = spark.conf.get("spark.sql.shuffle.partitions")
    try {
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
        }
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevPartitions)
    }
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }
}
