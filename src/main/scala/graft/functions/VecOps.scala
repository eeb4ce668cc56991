package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two float vectors, accumulated in double, left to right —
  * value-identical to `aggregate(zip_with(a,b,(x,y)=>x.cast(double)*y),
  * 0.0, _+_)` (which the DuckDB oracle mirrors) but a primitive loop
  * instead of per-element interpreted lambdas: higher-order functions
  * have no codegen, and at top-k time the lambda path dominated the
  * whole ANN query.
  */
object VecKernels {
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** `dot_f(a, b)` for `array<float>` columns. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VecKernels.dotF($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProductF = copy(l, r)
}

object Vec {
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductF(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
