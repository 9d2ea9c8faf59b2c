package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: run every registered query at sf0.001 and report failures. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SMOKE_SF_DIR", "/root/testdata/sf0.001")
    val qs = SparkEntry.queries
    var fail = 0
    qs.keys.toSeq.sorted.foreach { n =>
      try { qs(n)(spark, dir).count() }
      catch { case e: Throwable =>
        fail += 1; println(s"FAIL $n: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}") }
    }
    println(s"DONE total=${qs.size} failed=$fail")
    spark.stop()
  }
}
