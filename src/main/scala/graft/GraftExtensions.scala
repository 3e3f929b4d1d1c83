package graft

import graft.functions.NormalizeSalaryExpr
import org.apache.spark.sql.{GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: makes graft's native expressions
  * available as SQL functions, so `spark.sql("... normalize_salary(s)
  * ...")` works in any session built with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard extension-injection surface for a library shipping custom
  * Catalyst expressions (SURVEY §7.3's option (b) toolchain).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder))
    }
    // whole-operator extension (SURVEY §7.3 option (c)): the native
    // sort-merge as-of join's planner strategy. Live sessions get it
    // lazily via GraftColumnBridge.addStrategy on first use instead.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectOptimizerRule(_ => graft.plans.PruneColumnsThroughAsOfJoin)
  }
}

object GraftExtensions {

  private def oneArg(name: String)(f: Expression => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(classOf[NormalizeSalaryExpr].getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name expects exactly one argument")
        f(children.head)
      })

  /** (name, info, builder) triples — one place to add future native
    * expressions.
    */
  private def twoArg(name: String)(f: (Expression, Expression) => Expression)
      : (String, ExpressionInfo, Seq[Expression] => Expression) =
    (name,
      new ExpressionInfo(graft.functions.VectorExprs.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(children.length == 2, s"$name expects exactly two arguments")
        f(children.head, children(1))
      })

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      oneArg("normalize_salary")(NormalizeSalaryExpr(_)),
      twoArg("vec_dot")(graft.functions.DotProductExpr(_, _)),
      twoArg("vec_cosine")(graft.functions.CosineSimilarityExpr(_, _)),
      ("collect_up_to",
        new ExpressionInfo(classOf[graft.functions.CollectUpTo].getName, "collect_up_to"),
        (children: Seq[Expression]) => {
          require(children.length == 2, "collect_up_to(expr, limit) expects two arguments")
          val limit = children(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"collect_up_to limit must be an integer literal, got $other")
          }
          graft.functions.CollectUpTo(children.head, limit).toAggregateExpression()
        }))

  /** Register on an already-running session (tests / REPLs that didn't
    * set spark.sql.extensions at build time).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      GraftColumnBridge.registerFunction(spark, name, info, builder)
    }
}
