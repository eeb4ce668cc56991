package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Imperative kernels for the hot text-analysis scalars, exposed as
  * codegen-friendly Catalyst expressions. Each is value-identical to a
  * composable regexp formulation (which the DuckDB oracles still use) but
  * one pass instead of several regex scans per document.
  */
object TextKernelOps {

  /** trim + lowercase + collapse runs of whitespace to single spaces.
    * Identical to regexp_replace(lower(trim(s)), '\s+', ' ') for the
    * Java/RE2 common ASCII whitespace class. */
  def normText(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < in.length) {
      val ch = in.charAt(i)
      val isWs = ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
        ch == '\f' || ch == '\r'
      if (isWs) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(ch))
        started = true
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Count non-overlapping occurrences of `word` bounded by \b on both
    * sides — the integer regexp_replace('\bword\b')-length-difference
    * formula computes. */
  def countWord(s: UTF8String, word: String): Int = {
    val in = s.toString
    val wlen = word.length
    if (wlen == 0) return 0
    var count = 0
    var i = 0
    while (i + wlen <= in.length) {
      if (in.startsWith(word, i) &&
          (i == 0 || !isWordChar(in.charAt(i - 1))) &&
          (i + wlen == in.length || !isWordChar(in.charAt(i + wlen)))) {
        count += 1
        i += wlen
      } else i += 1
    }
    count
  }
}

/** `norm_text(s)` — canonical lowercased whitespace-collapsed text. */
case class NormText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    TextKernelOps.normText(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelOps.normText($c)")
  override protected def withNewChildInternal(c: Expression): NormText = copy(c)
}

/** `count_word(s, word)` — \b-bounded occurrence count of a literal word. */
case class CountWord(child: Expression, word: String) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    TextKernelOps.countWord(v.asInstanceOf[UTF8String], word)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("word", word, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelOps.countWord($c, $w)")
  }
  override protected def withNewChildInternal(c: Expression): CountWord = copy(child = c)
}

object TextKernels {
  def normText(c: Column): Column =
    ColumnBridge.column(NormText(ColumnBridge.expression(c)))
  def countWord(c: Column, word: String): Column =
    ColumnBridge.column(CountWord(ColumnBridge.expression(c), word))
}
