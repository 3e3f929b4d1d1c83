package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge for graft's native expressions
  * (e.g. graft.functions.NormalizeSalaryExpr).
  *
  * Spark 4 made `ExpressionUtils` private[sql]; a library adding custom
  * expressions either registers them through SparkSessionExtensions
  * (overkill for Column-level use) or exposes this thin accessor from
  * inside the sql package — the conventional extension pattern.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a function builder on a LIVE session (the
    * already-running-session counterpart of
    * SparkSessionExtensions.injectFunction, which only applies at
    * session build time).
    */
  def registerFunction(
      spark: SparkSession, name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
