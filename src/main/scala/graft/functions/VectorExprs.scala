package graft.functions

import org.apache.spark.sql.{Column, GraftExprBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector math for embedding similarity.
  *
  * Why native: `zip_with` + `aggregate` lambdas are evaluated by the
  * interpreter per element — on an all-pairs cosine job that is
  * |pairs|·dim interpreted closure calls and dominates the profile
  * (measured ~3× total-bench cost at sf0.1). [[DotProduct]] runs the
  * same sequential double-precision fold as one generated static call,
  * staying inside WholeStageCodegen.
  *
  * Arithmetic parity: identical left-to-right fold of
  * `x_i.toDouble * y_i.toDouble` — bit-identical to the higher-order-
  * function formulation (pinned by VectorExprsSpec), so the DuckDB
  * oracle comparisons are unaffected.
  */
object VectorExprs {

  /** Double-precision dot product of two float/double array columns. */
  def dotNative(a: Column, b: Column): Column =
    GraftExprBridge.column(
      DotProduct(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
}

/** Sequential-fold dot product over two numeric arrays (float or
  * double elements; mixed allowed). Null if either side is null;
  * folds over the common prefix length like `zip_with` would after a
  * length mismatch — callers guarantee equal dims.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(s"dot_product: unsupported $t")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.compute(
      l.asInstanceOf[ArrayData], isFloat(left),
      r.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProduct.compute($a, ${isFloat(left)}, $b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Static kernel (called from generated code — keep Java-callable). */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0d
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
