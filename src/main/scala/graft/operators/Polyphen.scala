package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Polyphen input preparation (Polyphen.java / PolyphenFasta.java):
  * for a variant that changed amino acid `pos` of a protein, emit the
  * reference AA at that position and the flanking sequence window
  * Polyphen scores against. Pure substring arithmetic — codegen'd.
  */
object Polyphen {

  /** Reference amino acid at 1-based `pos`. */
  def refAa(protein: Column, pos: Column): Column =
    protein.substr(pos, lit(1))

  /** Window of `flank` residues either side of `pos` (clamped at the
    * protein start; `substr` clamps the end naturally). */
  def aaWindow(protein: Column, pos: Column, flank: Int): Column =
    protein.substr(greatest(lit(1), pos - flank), lit(2 * flank + 1))

  /** FASTA chunking: split a sequence into 70-char lines
    * (PolyphenFasta.java:112-117). */
  def fastaLines(seq: Column): Column =
    explode(split(regexp_replace(seq, "(.{70})", "$1\n"), "\n"))
}
