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

  /** Drain the async listener bus so a task-metrics listener (the
    * StressCheck shuffle accounting) has observed every completed task
    * before its counters are read. `listenerBus` is `private[spark]`,
    * hence the package-placed accessor.
    */
  def flushListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Replace a materialized (persisted-and-computed) DataFrame's logical
    * plan with an O(1) `LogicalRDD` over its execution RDD. Iterative
    * algorithms need this: a loop whose round k references round k−1's
    * DataFrame more than once (self-joins) grows the logical tree
    * exponentially even when every round is persisted — the cache bounds
    * recompute, not plan size, and a ~6-round loop OOMs just *printing*
    * the plan. The caller must keep the ORIGINAL DataFrame handle to
    * unpersist, and must not release it until everything derived from the
    * flattened plan is itself materialized (the LogicalRDD scans the
    * cache; dropping the cache would silently replay the old lineage).
    */
  def flattenPlan(df: Dataset[Row]): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema)
  }

  /** Wrap a one-row/one-column DataFrame as an uncorrelated scalar
    * subquery expression — the vehicle Spark's own runtime row-level
    * filtering uses to hand a driver-computed value (e.g. a bloom filter
    * blob) to executor-side predicates without any collect() in user code.
    */
  def scalarSubquery(df: Dataset[Row]): Column = {
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    column(catalyst.expressions.ScalarSubquery(cdf.queryExecution.analyzed))
  }

  /** The wider of two types under Spark's own union/comparison coercion
    * rules (`TypeCoercion.findWiderTypeForTwo`) — what a join condition
    * would coerce both sides to. None when the pair is incomparable.
    */
  def widerType(a: types.DataType, b: types.DataType): Option[types.DataType] =
    catalyst.analysis.TypeCoercion.findWiderTypeForTwo(a, b)

  /** Register a temp SQL function backed by a Catalyst expression builder
    * (the registry lives behind `sessionState`, also `private[sql]`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
