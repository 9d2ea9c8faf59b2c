package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Config notes (the knobs that matter at scale, exercised here at
  * local[32]): shuffle partitions sized to cores not the 200 default, AQE
  * on for runtime coalescing/skew handling, default broadcast threshold so
  * dim tables (region/nation/supplier/part at these SFs) broadcast instead
  * of shuffling lineitem. A warmup query is run first so JVM/codegen
  * startup isn't attributed to the first timed query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise scan + shuffle + codegen once, untimed
    try SparkEntry.queries.get("q1_pricing_summary").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      // failures are marked -1 (not a fast success) and excluded from total
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Millisecond precision keeps the line compact; the driver captures only
    // a bounded tail of stdout (round 1's full-precision line overflowed it),
    // so the same line is also written to bench.json / $SPARK_GRAFT_BENCH_OUT.
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    val outs = Seq("bench.json") ++ sys.env.get("SPARK_GRAFT_BENCH_OUT")
    outs.foreach { p =>
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(p), (line + "\n").getBytes("UTF-8"))
      catch { case e: Throwable => System.err.println(s"[bench] write $p: ${e.getMessage}") }
    }
    println(line)
    spark.stop()
  }
}
