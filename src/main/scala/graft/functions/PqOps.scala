package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization codebooks as a single reference object.
  *
  * The first formulation of PQ encode / ADC search rendered the 8×16×8
  * codebook into the expression tree itself (an `array_min` over 16
  * literal structs per subspace, each holding an 8-term dot product).
  * Catalyst happily codegens that — into a 31 KB Janino method, which is
  * over HotSpot's 8 KB `HugeMethodLimit`, so the whole hot stage (corpus
  * encode + broadcast join + per-pair ADC) ran as never-JIT-compiled
  * interpreted bytecode: 6.5 s where the equally-shaped IVF query takes
  * 0.7 s. Holding the codebooks in one broadcast-serialized object and
  * calling a primitive kernel keeps the generated method tiny and the
  * stage JIT-compiled.
  *
  * `selfDots` precomputes `|c|²` per centroid with the same left-to-right
  * double accumulation the SQL-literal formulation used, so results stay
  * bit-identical and the DuckDB oracle (which still uses the explicit
  * literal formulation) keeps matching on hash.
  */
final class PqModel(val codebooks: Array[Array[Array[Float]]])
    extends Serializable {
  val numSub: Int = codebooks.length
  val codebookSize: Int = codebooks(0).length
  val subDim: Int = codebooks(0)(0).length
  val selfDots: Array[Array[Double]] = codebooks.map(_.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i).toDouble * c(i).toDouble; i += 1 }
    s
  })
}

/** Primitive kernels — each value-identical to the explicit literal
  * formulation (slice + dot + struct array_min / element_at chains) that
  * the DuckDB oracles still derive independently.
  */
object PqKernels {
  /** Nearest-centroid code per subspace: argmin_j `|c_j|² − 2·v_m·c_j`,
    * ties to the lowest j (what `array_min` over (d, c) structs picks).
    * Dot products accumulate float→double left to right, clamped to the
    * available elements (the `slice` + min-length semantics of the
    * formulation it replaces). */
  def encode(vec: ArrayData, model: PqModel): ArrayData = {
    val codes = new Array[Int](model.numSub)
    val vn = vec.numElements()
    var m = 0
    while (m < model.numSub) {
      val off = m * model.subDim
      val cb = model.codebooks(m)
      val sds = model.selfDots(m)
      val n = math.max(0, math.min(model.subDim, vn - off))
      var bestD = Double.PositiveInfinity
      var bestJ = 0
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += vec.getFloat(off + i).toDouble * c(i).toDouble
          i += 1
        }
        val d = sds(j) - 2.0 * acc
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      codes(m) = bestJ
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** Per-query ADC lookup table: `lut[m][j] = |c_{m,j}|² − 2·q_m·c_{m,j}`
    * — the table the broadcast projection used to build as nested array
    * literals, one primitive pass instead. */
  def lut(vec: ArrayData, model: PqModel): ArrayData = {
    val rows = new Array[Any](model.numSub)
    val vn = vec.numElements()
    var m = 0
    while (m < model.numSub) {
      val off = m * model.subDim
      val cb = model.codebooks(m)
      val sds = model.selfDots(m)
      val n = math.max(0, math.min(model.subDim, vn - off))
      val out = new Array[Double](cb.length)
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += vec.getFloat(off + i).toDouble * c(i).toDouble
          i += 1
        }
        out(j) = sds(j) - 2.0 * acc
        j += 1
      }
      rows(m) = UnsafeArrayData.fromPrimitiveArray(out)
      m += 1
    }
    new GenericArrayData(rows)
  }

  /** Per-subspace quantization distortion: `|v_m|² + min_j(|c_j|² −
    * 2·v_m·c_j)` — the squared reconstruction error of the code each
    * subvector would be assigned ([[encode]]'s argmin VALUE instead of
    * its index, plus the subvector's own self-dot). Same float→double
    * left-to-right accumulation and length-clamp as [[encode]], so the
    * literal-formulation oracle re-derives it bit-identically. */
  def distortions(vec: ArrayData, model: PqModel): ArrayData = {
    val out = new Array[Double](model.numSub)
    val vn = vec.numElements()
    var m = 0
    while (m < model.numSub) {
      val off = m * model.subDim
      val cb = model.codebooks(m)
      val sds = model.selfDots(m)
      val n = math.max(0, math.min(model.subDim, vn - off))
      var sd = 0.0
      var i = 0
      while (i < n) {
        val x = vec.getFloat(off + i).toDouble
        sd += x * x
        i += 1
      }
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var acc = 0.0
        var t = 0
        while (t < n) {
          acc += vec.getFloat(off + t).toDouble * c(t).toDouble
          t += 1
        }
        val d = sds(j) - 2.0 * acc
        if (d < bestD) bestD = d
        j += 1
      }
      out(m) = sd + bestD
      m += 1
    }
    new GenericArrayData(out)
  }

  /** ADC distance surrogate: `Σ_m lut[m][codes[m]]`, summed left to right
    * starting from the m=0 term — the exact fold order of the
    * `element_at` chain it replaces. */
  def adc(lut: ArrayData, codes: ArrayData): Double = {
    val n = codes.numElements()
    var acc = lut.getArray(0).getDouble(codes.getInt(0))
    var m = 1
    while (m < n) {
      acc += lut.getArray(m).getDouble(codes.getInt(m))
      m += 1
    }
    acc
  }
}

/** `pq_encode(vec)` → `array<int>` codes. */
case class PqEncodeExpr(child: Expression, model: PqModel)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.encode($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** `pq_lut(query_vec)` → `array<array<double>>` ADC table. */
case class PqLutExpr(child: Expression, model: PqModel)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    PqKernels.lut(v.asInstanceOf[ArrayData], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.PqKernels.lut($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** `pq_distortions(vec)` → `array<double>` per-subspace squared
  * reconstruction error. */
case class PqDistortionsExpr(child: Expression, model: PqModel)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    PqKernels.distortions(v.asInstanceOf[ArrayData], model)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqKernels.distortions($c, $ref)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): PqDistortionsExpr = copy(child = newChild)
}

/** `pq_adc(lut, codes)` → double distance surrogate. */
case class PqAdcExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(lut: Any, codes: Any): Any =
    PqKernels.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, c) => s"graft.functions.PqKernels.adc($l, $c)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcExpr = copy(l, r)
}

object Pq {
  def encode(vec: Column, model: PqModel): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec), model))
  def lut(vec: Column, model: PqModel): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(vec), model))
  def distortions(vec: Column, model: PqModel): Column =
    ColumnBridge.column(
      PqDistortionsExpr(ColumnBridge.expression(vec), model))
  def adc(lut: Column, codes: Column): Column =
    ColumnBridge.column(
      PqAdcExpr(ColumnBridge.expression(lut), ColumnBridge.expression(codes)))
}
