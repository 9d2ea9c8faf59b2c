package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the LLM-pipeline
  * extensions) appears as one `queries` entry; SQL-expressible ones carry a
  * DuckDB oracle in `oracleSql`. Column names are aliased identically on
  * both sides (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Tables.sql(spark, "/root/testdata/sf0.001", TpchQueries.q1.spark)

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TpchQueries.all.map { q =>
      q.name -> ((s: SparkSession, dir: String) => Tables.sql(s, dir, q.spark))
    }.toMap ++
      ops.OpQueries.all.map(q => q.name -> q.fn).toMap ++
      ops.ExtraQueries.all.map(q => q.name -> q.fn).toMap ++
      ops.SurfaceQueries.all.map(q => q.name -> q.fn).toMap ++
      ops.DialectQueries.all.map(q => q.name -> q.fn).toMap ++
      llm.LlmQueries.all.map(q => q.name -> q.fn).toMap ++
      streaming.StreamQueries.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    TpchQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap ++
      ops.OpQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap ++
      ops.ExtraQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap ++
      ops.SurfaceQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap ++
      ops.DialectQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap ++
      llm.LlmQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap ++
      streaming.StreamQueries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
