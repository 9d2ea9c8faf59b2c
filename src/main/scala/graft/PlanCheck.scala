package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Plan auditor — `sbt "runMain graft.PlanCheck [sfDir]"`.
  *
  * Prints, for every driver query, the scale-critical properties of its
  * physical plan: parquet filter pushdown, read-schema pruning, join
  * strategies (broadcast vs shuffle), and whole-stage codegen coverage.
  * This is the ".explain and iterate" loop from the build brief turned
  * into a repeatable report — a plan regression (lost pushdown, a dim
  * join degrading to sort-merge) shows up as a diff of this output.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe: QueryExecution = fn(spark, sfDir).queryExecution
        val plan = qe.executedPlan.toString
        def count(s: String): Int = s.r.findAllIn(plan).length
        val pushed = "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
        val features = Seq(
          "bhj" -> count("BroadcastHashJoin"),
          "smj" -> count("SortMergeJoin"),
          "shj" -> count("ShuffledHashJoin"),
          "bnlj" -> count("BroadcastNestedLoopJoin"),
          "topk" -> count("TakeOrderedAndProject"),
          "partial_agg" -> count("HashAggregate"),
          "wscg" -> count("WholeStageCodegen"),
          "exchange" -> count("Exchange "),
          "pushed_filters" -> pushed)
          .filter(_._2 > 0)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"PLAN $name :: $features")
      } catch {
        case e: Throwable => println(s"PLAN $name :: ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
