package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access point for the handful of `private[sql]` helpers an extension
  * library legitimately needs: Column ↔ Expression conversion (the
  * Spark 4 Column is a Connect-compatible facade, so the classic
  * converter lives behind package-private API).
  */
object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Run a (possibly hand-transformed) unresolved logical plan through
    * the session's analyzer/optimizer — the staged-overlay transaction
    * layer parses a statement, redirects table relations to the
    * connection's staged copies, and needs `Dataset.ofRows` to execute
    * the result. */
  def dataset(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
