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

  /** The PolyphenFasta recovery flow (PolyphenFasta.java:22,91-125):
    * proteins whose Polyphen run failed because the sequence wasn't in
    * the known protein set → one 70-char-wrapped FASTA record each, as
    * ordered (protein_id, line_no, line) rows. Anti-join against the
    * known ids, then min(seq) per protein so a protein attempted by many
    * variants — even with conflicting sequence versions — is written
    * exactly once, deterministically. The anti-join broadcasts or
    * shuffles on the protein id like any equi-join; line explosion is
    * per-row and bounded by sequence length.
    */
  def fastaForMissing(attempted: DataFrame, known: DataFrame,
                      idCol: String = "protein_id",
                      seqCol: String = "protein_seq"): DataFrame = {
    val missing = attempted.select(col(idCol), col(seqCol))
      .join(known.select(col(idCol)), Seq(idCol), "left_anti")
      .groupBy(col(idCol)).agg(min(col(seqCol)).as(seqCol))
    missing
      .select(col(idCol),
        posexplode(split(concat(lit(">"), col(idCol), lit("\n"),
          regexp_replace(col(seqCol), "(.{70})", "$1\n")), "\n"))
          .as(Seq("line_no", "line")))
      // a sequence length divisible by 70 leaves a trailing empty split
      .filter(col("line") =!= "")
      .select(col(idCol), col("line_no").cast("long").as("line_no"), col("line"))
  }

  /** Polyphen input generation — the submit half of the round trip
    * (Polyphen.java:206-251). From nonsynonymous annotations joined with
    * their full protein sequence, emit:
    *  - `input_line`:  `PROTEIN_ACC_ID POS REF_AA VAR_AA` (space-separated)
    *  - `info_line`:   variant_id, locus, protein, pos, ref, var, strand,
    *    transcript (tab-separated — what [[loadPredictions]]' info table
    *    serializes to)
    *  - `fasta`:       `>PROTEIN_ACC_ID` + the 70-char-wrapped sequence
    *
    * Simple-protein QC (Polyphen.java:207-226): a stop codon in the
    * middle of the protein at or before pos+10 disqualifies the record;
    * a terminal stop, or one well past the variant, is fine.
    *
    * Expects columns: variant_id, tr_id, protein_id, aa_pos, ref_aa,
    * var_aa, gene_symbol, strand, protein_seq. */
  def inputRecords(ann: DataFrame): DataFrame = {
    val stop0 = instr(col("protein_seq"), "*") - 1 // 0-based first '*', -1 if none
    val midStop = stop0 >= 0 &&
      stop0 < length(col("protein_seq")) - 1 &&
      stop0 <= col("aa_pos") + 10
    ann.filter(col("syn_status") === "nonsynonymous" && !midStop)
      .select(
        col("variant_id"), col("tr_id"), col("protein_id"), col("aa_pos"),
        col("ref_aa"), col("var_aa"),
        concat_ws(" ", col("protein_id"), col("aa_pos"), col("ref_aa"),
          col("var_aa")).as("input_line"),
        concat_ws("\t", col("variant_id"), col("gene_symbol"),
          col("protein_id"), col("aa_pos"), col("ref_aa"), col("var_aa"),
          col("strand"), col("tr_id")).as("info_line"),
        concat(lit(">"), col("protein_id"), lit("\n"),
          regexp_replace(col("protein_seq"), "(.{70})", "$1\n")).as("fasta"))
  }

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
