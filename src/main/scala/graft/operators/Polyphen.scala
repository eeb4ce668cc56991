package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
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

  /** Parse Polyphen prediction-result TSV lines — the load-back half of
    * the round trip (PolyphenLoader.java:104-188). Column indexes follow
    * the reference: 0 protein acc, 1 o_pos, 2 o_aa1, 3 o_aa2, 5 uniprot,
    * 7 aa1, 8 aa2, 11 prediction, 12 based_on, 13 effect, 14 pph2_class,
    * 15 pph2_prob. Records whose o_aa1/o_aa2 arrive swapped versus
    * aa1/aa2 mean the transcript sequence diverged from the chromosome
    * FASTA — the reference skips them (PolyphenLoader.java:172-181), and
    * so do we. Header lines (leading '#') are dropped.
    */
  def parseResults(lines: Dataset[String]): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val cols = split(col("line"), "\t")
    def c(i: Int): Column = trim(element_at(cols, i + 1))
    lines.toDF("line")
      .filter(!col("line").startsWith("#") && length(col("line")) > 0)
      .select(
        c(0).as("protein_id"), c(1).cast("long").as("o_pos"),
        c(2).as("o_aa1"), c(3).as("o_aa2"), c(5).as("uniprot_acc"),
        c(7).as("ref_aa"), c(8).as("var_aa"),
        c(11).as("prediction"), c(12).as("based_on"), c(13).as("effect"),
        c(14).as("pph2_class"), c(15).cast("double").as("pph2_prob"))
      .filter(!(col("o_aa1") === col("var_aa") && col("o_aa2") === col("ref_aa")))
  }

  /** Join parsed predictions back onto the variant↔protein info table on
    * (protein_id, o_pos, o_aa1, o_aa2) — the extractInfo lookup of
    * PolyphenLoader.java:183-196 as a declarative join. `info` must carry
    * protein_id, aa_pos, ref_aa, var_aa plus the payload columns
    * (variant_id, gene_symbol, strand, transcript_rgd_id, ...). */
  def loadPredictions(results: DataFrame, info: DataFrame): DataFrame =
    results.join(info,
      results("protein_id") === info("protein_id") &&
        results("o_pos") === info("aa_pos") &&
        results("o_aa1") === info("ref_aa") &&
        results("o_aa2") === info("var_aa"),
      "inner")
      .drop(info("protein_id")).drop(info("ref_aa")).drop(info("var_aa"))
      .drop(info("aa_pos"))
}
