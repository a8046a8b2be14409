package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Wraps a custom logical plan into a DataFrame. `Dataset.ofRows` is
  * the seam every Spark extension library uses for this; it is
  * `private[sql]`, so this one-object glue package sits under
  * `org.apache.spark.sql` to reach it — the standard shim pattern for
  * planner-extension libraries. Nothing else in the repo lives
  * outside the `graft` namespace. */
object GraftPlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ Expression bridge (`classic.ExpressionUtils`, also
    * `private[sql]`) — lets graft's native expressions build Columns
    * directly, with no function-registry round trip. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
