package graft
/** Dev-only: print queries that have no DuckDB oracle (rows-only gates). */
object DevGaps {
  def main(args: Array[String]): Unit = {
    val gaps = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted
    println(s"queries=${SparkEntry.queries.size} oracles=${SparkEntry.oracleSql.size} gaps=${gaps.size}")
    gaps.foreach(g => println(s"  $g"))
  }
}
