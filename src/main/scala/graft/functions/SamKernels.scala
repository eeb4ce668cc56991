package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass CIGAR walk (SAMv1 spec op classes) as a codegen-friendly
  * kernel — replaces the interpreted higher-order `aggregate` fold over
  * `regexp_extract_all` pieces that dominated the Sam source's cost
  * (the suite's most expensive stage: a regex scan + per-piece
  * interpreted fold per row). The kernel is value-identical to that
  * column formulation on well-formed CIGARs (pinned by
  * SamKernelParitySpec) but a single char walk, inside whole-stage
  * codegen.
  *
  * Accumulator slots, as before: [ref_span, n_aligned, n_clipped]
  *  - reference-consuming: M, D, N, =, X  (ref_span)
  *  - aligned bases:       M, =, X        (n_aligned)
  *  - clipping:            S, H           (n_clipped)
  *  - length-only:         I, P           (counted as ops, no span)
  *
  * MALFORMED CIGARs return NULL (→ row quarantined by the caller's
  * `isNotNull` gate) — unlike the old regex fold, which silently
  * skipped unparseable segments so a corrupt CIGAR (`abc`, a bare
  * `100`) passed the gate with ref_span=0 and end_pos before the read
  * start. Malformed = empty string, a number with no op letter, an op
  * letter with no preceding number, any char outside [0-9MIDNSHP=X],
  * or a length that overflows a signed long.
  */
object SamKernelOps {

  /** Null iff the CIGAR does not tile into (number, op) pairs. */
  def cigarSpans(s: UTF8String): ArrayData = {
    val a = cigarSpansRaw(s.toString)
    if (a == null) null else new GenericArrayData(a)
  }

  /** The walk itself on a plain String — shared by the Column kernel and
    * the Sam mapPartitions parse. Null = malformed. */
  def cigarSpansRaw(in: String): Array[Long] = {
    var i = 0
    var refSpan = 0L
    var aligned = 0L
    var clipped = 0L
    var nOps = 0
    while (i < in.length) {
      var n = 0L
      var nd = 0
      var c = in.charAt(i)
      while (c >= '0' && c <= '9') {
        if (n > (Long.MaxValue - 9) / 10) return null // overflow
        n = n * 10 + (c - '0')
        nd += 1
        i += 1
        c = if (i < in.length) in.charAt(i) else ' '
      }
      if (nd == 0 || i >= in.length) return null
      i += 1
      c match {
        case 'M' | '=' | 'X' => refSpan += n; aligned += n
        case 'D' | 'N'       => refSpan += n
        case 'S' | 'H'       => clipped += n
        case 'I' | 'P'       => ()
        case _               => return null
      }
      nOps += 1
    }
    if (nOps == 0) null
    else Array(refSpan, aligned, clipped)
  }
}

/** `cigar_spans(cigar)` — [ref_span, n_aligned, n_clipped] longs, or
  * NULL for a malformed CIGAR (quarantine signal). */
case class CigarSpans(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    SamKernelOps.cigarSpans(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.SamKernelOps.cigarSpans"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $f($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(c: Expression): CigarSpans =
    copy(c)
}

object SamKernels {
  def cigarSpans(c: Column): Column =
    ColumnBridge.column(CigarSpans(ColumnBridge.expression(c)))
}
