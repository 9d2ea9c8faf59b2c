package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a comma-separated list of driver
  * queries to `<outDir>/<name>_<suffix>.txt` — the r19 optimization
  * round's plan-evidence tool (`plans/r19/<q>_before.txt` / `_after.txt`).
  *
  * `sbt "runMain graft.ExplainDump q1,q2 /root/repo/plans/r19 before [sfDir]"`
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val outDir = args(1)
    val suffix = args(2)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val txt =
        try df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"EXPLAIN FAILED: ${e.getMessage}" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"EXPLAINED $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
