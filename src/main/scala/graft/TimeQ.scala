package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    args(0).split(",").foreach { name =>
      val f = SparkEntry.queries(name)
      f(spark, dir).count() // warm
      val t0 = System.nanoTime()
      val n = f(spark, dir).count()
      println(f"TIME $name rows=$n ${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    spark.stop()
  }
}
