package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Dna

/** Post-hoc amino-acid audit — the VariantPostProcessing.verifyAA pass
  * (reference VariantPostProcessing.java:1067-1280): for every annotation
  * that reached an AA call, re-derive the ref/var codon from the STORED
  * CDS columns (`full_ref_nuc`, `full_ref_nuc_pos`), translate, and tally
  * agreement with the stored `ref_aa`/`var_aa`/`syn_status`. The
  * annotation-family twin of the q8/q30 recompute-and-compare fixups: a
  * pipeline owner runs it after every annotation load, and non-zero
  * mismatch counts mean the load is internally inconsistent.
  *
  * Scale shape: one narrow projection + a broadcastable transcript join +
  * a single global aggregate (map-side combined) — no wide shuffle; the
  * only data movement is the strand lookup, keyed on tr_id.
  */
object VerifyAa {

  /** @param annotated  TranscriptAnnotator output (needs syn_status,
    *                    ref_nuc/var_nuc, ref_aa/var_aa, full_ref_nuc,
    *                    full_ref_nuc_pos, tr_id)
    * @param transcripts strand lookup: tr_id, strand — the reference
    *                    resolves strand per-row from its maps tables
    *                    (getStrandForTranscript), not from the annotation
    * @return one row of audit tallies (skipped_no_strand,
    *         skipped_codon_bounds, neg_strand, matches, mismatches,
    *         syn_match, syn_mismatch, nonsyn_mismatch, syn_xx_match)
    */
  def audit(annotated: DataFrame, transcripts: DataFrame): DataFrame = {
    // audited set = SNV rows with an AA call (the reference substitutes
    // exactly one base; its var_nuc.charAt(0) on multi-base alleles is a
    // JDBC-loop artifact, not a semantic)
    val audited = annotated
      .filter(col("syn_status").isNotNull &&
        length(col("ref_nuc")) === 1 &&
        col("var_nuc").isin("A", "C", "G", "T"))
      .join(transcripts.select(col("tr_id"), col("strand")),
        Seq("tr_id"), "left")
    val nucPos = col("full_ref_nuc_pos")
    val off = pmod(nucPos - 1, lit(3)) // 0-based offset within the codon
    val codon0 = nucPos - 1 - off      // 0-based codon start
    val inBounds = codon0 + 2 < length(col("full_ref_nuc"))
    val codonRef = col("full_ref_nuc").substr(codon0 + 1, lit(3))
    val aaRefT = Dna.translateDna(codonRef)
    // on '-' strand the stored CDS is already reverse-complemented, so
    // the substituted base must be complemented too (the reference
    // revcomps var_nuc before the setCharAt)
    val varSub = when(col("strand") === "-",
      Dna.reverseComplement(col("var_nuc"))).otherwise(col("var_nuc"))
    val codonVar = concat(codonRef.substr(lit(1), off), varSub,
      codonRef.substr(off + 2, lit(3)))
    val aaVarT = Dna.translateDna(codonVar)
    val synProblem =
      (col("syn_status") === "synonymous" && aaRefT =!= aaVarT) ||
      (col("syn_status") === "nonsynonymous" && aaRefT === aaVarT)
    val matched = col("var_aa") === aaVarT
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val ok = col("strand").isNotNull && col("ib")
    audited
      .select(col("strand"), col("syn_status"), col("ref_aa"), col("var_aa"),
        inBounds.as("ib"), synProblem.as("sp"), matched.as("m"))
      .agg(
        cnt(col("strand").isNull).as("skipped_no_strand"),
        cnt(col("strand").isNotNull && !col("ib")).as("skipped_codon_bounds"),
        cnt(col("strand") === "-" && col("ib")).as("neg_strand"),
        cnt(ok && col("m")).as("matches"),
        cnt(ok && !col("m")).as("mismatches"),
        cnt(ok && !col("sp")).as("syn_match"),
        cnt(ok && col("sp") && col("syn_status") === "synonymous")
          .as("syn_mismatch"),
        cnt(ok && col("sp") && col("syn_status") === "nonsynonymous")
          .as("nonsyn_mismatch"),
        cnt(ok && col("sp") && col("m") &&
          (col("ref_aa") === "X" || col("var_aa") === "X")).as("syn_xx_match"))
  }
}
