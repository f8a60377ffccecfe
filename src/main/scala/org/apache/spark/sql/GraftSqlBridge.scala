package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` access bridge for out-of-tree plan nodes (the
  * standard pattern for Spark extensions that materialize a DataFrame from a
  * custom `LogicalPlan`): `Dataset.ofRows` is package-private, so the one
  * call lives in this package. Nothing else from the internal surface leaks.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
