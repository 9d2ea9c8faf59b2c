package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-placed bridge between public `Column`s and Catalyst
  * `Expression`s — the standard pattern used by Spark extension libraries
  * (frameless, deequ, spark-nlp all ship an `org.apache.spark.sql`-package
  * accessor) because the converters are `private[sql]` in Spark 4.
  * Only used by graft's custom expressions ([[graft.functions]]).
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function backed by a Catalyst expression builder
    * (the registry lives behind `sessionState`, also `private[sql]`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
