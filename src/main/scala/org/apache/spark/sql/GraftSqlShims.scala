package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed shim exposing the two `private[sql]` hooks a library
  * needs to host a custom operator: building a DataFrame from a
  * LogicalPlan, and reading a DataFrame's analyzed plan. This is the
  * standard extension-library pattern (the same access the built-in
  * operators get); nothing else from the internals is touched.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed
}
