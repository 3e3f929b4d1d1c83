package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity family.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b,
  * _*_), 0.0, _+_)`) is semantically right but allocates a zipped
  * array per row-pair and evaluates a lambda per element outside
  * whole-stage codegen. The brute-force cosine path (q_l5) evaluates
  * |Q|·|C| of these — it IS the operator. These expressions run the
  * same left-to-right accumulation as a tight primitive loop over the
  * two ArrayData (no intermediate array, no lambda dispatch), so
  * results are BIT-IDENTICAL to the aggregate/zip_with form and to
  * DuckDB's list_inner_product — the oracle contract the family is
  * built on.
  *
  * Null semantics replicate aggregate(zip_with(...)): null array,
  * length mismatch, or any null element → null result.
  */
object VectorExprs {

  /** Σ a[i]·b[i], left to right; null per the contract above. */
  def dotArr(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** dot/(√Σa²·√Σb²) with all three accumulators in ONE pass. */
  def cosineArr(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotCol(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosineCol(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarityExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}

/** Shared shape of the two kernels: array<double> ⊗ array<double> →
  * double, evaluated via a static helper that the generated code calls
  * directly (stays inside whole-stage codegen; no Row/lambda machinery).
  */
abstract class VectorBinaryExpr extends BinaryExpression with Serializable {

  /** graft.functions.VectorExprs.<helperName>(ArrayData, ArrayData) */
  protected def helperName: String
  protected def helper(a: ArrayData, b: ArrayData): java.lang.Double

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    helper(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val boxed = ctx.freshName("boxed")
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${l.isNull}) {
        ${r.code}
        if (!${r.isNull}) {
          java.lang.Double $boxed =
            graft.functions.VectorExprs.$helperName(${l.value}, ${r.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      }
    """)
  }
}

case class DotProductExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def helperName: String = "dotArr"
  override protected def helper(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorExprs.dotArr(a, b)
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

case class CosineSimilarityExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override protected def helperName: String = "cosineArr"
  override protected def helper(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorExprs.cosineArr(a, b)
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}
