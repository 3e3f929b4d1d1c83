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

  /** Wrap a logical plan as a DataFrame (`Dataset.ofRows` went
    * private[sql] with the Spark 4 API split — custom LogicalPlan
    * nodes need this to re-enter the Dataset world).
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The ANALYZED logical plan of a DataFrame — the resolved-attribute
    * form a custom logical node composes over.
    */
  def analyzed(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Idempotently add a planner strategy to a LIVE session (the
    * runtime counterpart of SparkSessionExtensions
    * .injectPlannerStrategy).
    */
  def addStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val exp = classic.experimental
    // a session built with GraftExtensions already carries the strategy
    // through the planner (injectPlannerStrategy) — checking only
    // extraStrategies would register a second copy and run it twice
    val alreadyPlanned = classic.sessionState.planner.strategies.contains(strategy)
    if (!alreadyPlanned && !exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }

  /** Idempotently add an optimizer rule to a LIVE session (runtime
    * counterpart of SparkSessionExtensions.injectOptimizerRule).
    */
  def addOptimizerRule(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val exp = classic.experimental
    // extension-injected rules (injectOptimizerRule) live in the
    // optimizer's batches, not in extraOptimizations — check both so a
    // GraftExtensions session doesn't run the rule twice per plan
    val alreadyBatched =
      classic.sessionState.optimizer.batches.exists(_.rules.exists(_ eq rule))
    if (!alreadyBatched && !exp.extraOptimizations.contains(rule))
      exp.extraOptimizations = exp.extraOptimizations :+ rule
  }
}
