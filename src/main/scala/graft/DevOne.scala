package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: dump one named SparkEntry query + its oracle (same shape as Verify). */
object DevOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    // no-oracle queries are OMITTED (matching Verify) — an empty-string
    // oracle would make check.py execute "" and fail spuriously
    // same escape as Verify: backslash, quote, ALL control chars (<0x20)
    val entry = SparkEntry.oracleSql.get(name)
      .map(_.flatMap {
        case '"'  => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      })
      .map(sql => s""""$name": "$sql"""").getOrElse("")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), s"{$entry}")
    spark.stop()
  }
}
