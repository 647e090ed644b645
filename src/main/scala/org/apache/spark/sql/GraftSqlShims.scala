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

  /** Non-blocking read of an [[Observation]]'s metrics: empty until the
    * observed action completes. `private[sql]` upstream; exposed so the
    * CC convergence fold can poll with a bounded wait instead of parking
    * the driver on `get` forever if the listener never fires. */
  def observedOrEmpty(obs: Observation): Map[String, Any] =
    obs.getOrEmpty
}
