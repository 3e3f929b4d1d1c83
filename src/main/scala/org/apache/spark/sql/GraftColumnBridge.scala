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
}
