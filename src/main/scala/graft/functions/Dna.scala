package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels for DNA sequence primitives, called from both interpreted
  * eval and generated code (static forwarders make them reachable from
  * Janino-generated Java).
  *
  * Semantics match the reference's hand-rolled implementations:
  *  - reverse complement: VariantPostProcessing.java:670-693 (A<->T, C<->G,
  *    N/?/. pass through, case-insensitive input, uppercase output)
  *  - translate: VariantPostProcessing.java:695-837 (standard codon table,
  *    '*' = stop, 'X' = unknown/ambiguous, trailing partial codon dropped)
  */
object DnaOps {

  def reverseComplement(s: UTF8String): UTF8String = {
    val in = s.toString
    val n = in.length
    val out = new Array[Char](n)
    var i = 0
    while (i < n) {
      val ch = in.charAt(n - 1 - i)
      out(i) = ch match {
        case 'A' | 'a' => 'T'
        case 'C' | 'c' => 'G'
        case 'G' | 'g' => 'C'
        case 'T' | 't' => 'A'
        case 'N' | 'n' => 'N'
        case '?'       => '?'
        case '.'       => '.'
        case other     => other // tolerate unknowns instead of throwing
      }
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** The 64 standard codon→AA pairs ('*' = stop); public so SQL oracles
    * can derive a CASE expression from the same source of truth. */
  val codonTable: Seq[(String, Char)] = {
    val table = Seq(
      "TTT F", "TTC F", "TTA L", "TTG L", "CTT L", "CTC L", "CTA L", "CTG L",
      "ATT I", "ATC I", "ATA I", "ATG M", "GTT V", "GTC V", "GTA V", "GTG V",
      "TCT S", "TCC S", "TCA S", "TCG S", "CCT P", "CCC P", "CCA P", "CCG P",
      "ACT T", "ACC T", "ACA T", "ACG T", "GCT A", "GCC A", "GCA A", "GCG A",
      "TAT Y", "TAC Y", "TAA *", "TAG *", "CAT H", "CAC H", "CAA Q", "CAG Q",
      "AAT N", "AAC N", "AAA K", "AAG K", "GAT D", "GAC D", "GAA E", "GAG E",
      "TGT C", "TGC C", "TGA *", "TGG W", "CGT R", "CGC R", "CGA R", "CGG R",
      "AGT S", "AGC S", "AGA R", "AGG R", "GGT G", "GGC G", "GGA G", "GGG G")
    table.map(e => e.substring(0, 3) -> e.charAt(4))
  }

  // Codon table indexed by 16*b1 + 4*b2 + b3 with A=0,C=1,G=2,T=3.
  private val AA: Array[Char] = {
    val t = Array.fill(64)('X')
    def idx(ch: Char) = ch match { case 'A' => 0; case 'C' => 1; case 'G' => 2; case 'T' => 3 }
    codonTable.foreach { case (codon, aa) =>
      t(16 * idx(codon.charAt(0)) + 4 * idx(codon.charAt(1)) + idx(codon.charAt(2))) = aa
    }
    t
  }

  private def baseIdx(ch: Char): Int = ch match {
    case 'A' | 'a' => 0
    case 'C' | 'c' => 1
    case 'G' | 'g' => 2
    case 'T' | 't' => 3
    case _         => -1
  }

  /** Translate DNA to amino acids; trailing bases that do not complete a
    * codon are ignored (the reference trims to a multiple of 3 upstream). */
  def translate(s: UTF8String): UTF8String = {
    val in = s.toString
    val nCodons = in.length / 3
    val out = new Array[Char](nCodons)
    var i = 0
    while (i < nCodons) {
      val b1 = baseIdx(in.charAt(3 * i))
      val b2 = baseIdx(in.charAt(3 * i + 1))
      val b3 = baseIdx(in.charAt(3 * i + 2))
      out(i) = if (b1 < 0 || b2 < 0 || b3 < 0) 'X' else AA(16 * b1 + 4 * b2 + b3)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** `reverse_complement(dna)` — strand flip of a nucleotide sequence. */
case class ReverseComplement(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    DnaOps.reverseComplement(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DnaOps.reverseComplement($c)")
  override protected def withNewChildInternal(c: Expression): ReverseComplement = copy(c)
}

/** `translate_dna(dna)` — codon-by-codon protein translation. */
case class TranslateDna(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    DnaOps.translate(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DnaOps.translate($c)")
  override protected def withNewChildInternal(c: Expression): TranslateDna = copy(c)
}

/** Column-level API for the DNA kernels. */
object Dna {
  def reverseComplement(c: Column): Column =
    ColumnBridge.column(ReverseComplement(ColumnBridge.expression(c)))
  def translateDna(c: Column): Column =
    ColumnBridge.column(TranslateDna(ColumnBridge.expression(c)))

  /** All overlapping k-mers of a sequence WITH multiplicity (order
    * preserved) — the counting-path contrast to ShingleOps' distinct
    * sets. Built-in `transform`/`sequence`/`substring` only, so the
    * whole expansion stays in whole-stage codegen; sequences shorter
    * than k yield an empty array (guarded — `sequence` would otherwise
    * step BACKWARDS for a negative span). */
  def kmers(dna: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{length, lit, sequence, transform, typedLit, when}
    require(k > 0, "k must be positive")
    when(length(dna) >= k,
      transform(sequence(lit(1), length(dna) - (k - 1)),
        i => dna.substr(i, lit(k))))
      .otherwise(typedLit(Array.empty[String]))
  }
}
