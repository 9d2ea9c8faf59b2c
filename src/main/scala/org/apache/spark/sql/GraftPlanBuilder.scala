package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge for building a DataFrame from a custom [[LogicalPlan]] node.
  *
  * `Dataset.ofRows` is `private[sql]`, so extension libraries that
  * introduce their own logical operators (graft's native AS-OF join,
  * `graft.plans.AsOfJoinNode`) expose it through a one-line forwarder in
  * the `org.apache.spark.sql` package — the standard pattern Spark
  * extension projects use for exactly this purpose. Nothing else from
  * the private surface is touched.
  */
object GraftPlanBuilder {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
