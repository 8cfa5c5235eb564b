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

  /** A plain binder-class error (the AnalysisException constructor is
    * private[sql]) — the transaction layer raises these for
    * catalog-shaped rejections that must NOT abort the open block
    * (DuckDB semantics: binder errors leave the transaction usable). */
  def analysisError(message: String): Nothing =
    throw new AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3100", // generic message passthrough
      messageParameters = Map("message" -> message))
}
