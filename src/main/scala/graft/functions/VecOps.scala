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

  /** Same accumulation against a driver-side plane vector. */
  def dotF(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b(i).toDouble
      i += 1
    }
    acc
  }

  /** Float column against a FULL-PRECISION double vector (power-
    * iteration projections: the iterate is a computed double vector —
    * rounding it to float would diverge from the oracle's double CTE
    * chain). Same left-to-right double accumulation. */
  def dotFD(a: ArrayData, b: Array[Double]): Double = {
    val n = math.min(a.numElements(), b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b(i)
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

/** `dot_fd(vec)` against a constant double vector (reference object —
  * 64 doubles rendered as literals would bloat the generated method). */
case class DotProductFD(child: Expression, b: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any): Any =
    VecKernels.dotFD(a.asInstanceOf[ArrayData], b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotVec", b, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernels.dotFD($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): DotProductFD =
    copy(child = c)
}

object Vec {
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductF(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dotFD(a: Column, b: Array[Double]): Column =
    ColumnBridge.column(DotProductFD(ColumnBridge.expression(a), b))

  def lshBands(vec: Column, model: LshModel): Column =
    ColumnBridge.column(LshBandsExpr(ColumnBridge.expression(vec), model))
}

/** Sign-LSH hyperplanes for `numTables` banded tables, as one reference
  * object — same motivation as [[PqModel]]: rendering 4×16 plane vectors
  * into the expression tree (one dot + `when` per plane) generated a
  * ~10 KB method, over HotSpot's 8 KB JIT limit, so the banded-LSH
  * bucket projection ran interpreted. Plane layout: `planes(t)(i)` is
  * plane `i` of table `t`. */
final class LshModel(val planes: Array[Array[Array[Float]]])
    extends Serializable {
  val numTables: Int = planes.length
  val planesPerTable: Int = planes(0).length
}

object LshKernels {
  /** Per-table sign buckets: bit `i` of `out(t)` set iff
    * `v · planes(t)(i) > 0`, with the dot accumulated float→double left
    * to right — value-identical to the `when(dot > 0, 1L << i)` sum the
    * literal formulation (and the SQL oracles) use. */
  def bands(vec: ArrayData, model: LshModel): ArrayData = {
    val out = new Array[Long](model.numTables)
    var t = 0
    while (t < model.numTables) {
      val tp = model.planes(t)
      var bucket = 0L
      var i = 0
      while (i < tp.length) {
        if (VecKernels.dotF(vec, tp(i)) > 0) bucket |= 1L << i
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** `lsh_bands(vec)` → `array<long>`, one sign-bucket per banded table. */
case class LshBandsExpr(child: Expression, model: LshModel)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    LshKernels.bands(v.asInstanceOf[ArrayData], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshModel", model, classOf[LshModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.LshKernels.bands($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): LshBandsExpr =
    copy(child = newChild)
}
