package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SAM alignment-line parser (SAMv1 spec, the 11 mandatory
  * tab-separated fields) → typed alignment rows with CIGAR-derived
  * span arithmetic — the read-alignment side of the variant-load
  * surface (a pileup/coverage pass over alignments is what feeds a
  * variant caller; the reference consumes the VCFs downstream of it).
  *
  * Spark shape: a PURE-COLUMN parse — field split plus a higher-order
  * `aggregate` fold over `regexp_extract_all` CIGAR pieces, all
  * codegen'd, no UDF, no shuffle; one narrow projection per line.
  * CIGAR op classes per the spec:
  *  - reference-consuming: M, D, N, =, X  (ref_span; end_pos =
  *    pos + ref_span − 1)
  *  - aligned bases: M, =, X  (n_aligned)
  *  - clipping: S, H  (n_clipped)
  * Header lines (`@...`) and unmapped reads (CIGAR `*` or pos 0) are
  * dropped — quarantine, not failure.
  */
object Sam {

  /** One fold over the CIGAR pieces accumulating all three op-class
    * sums at once — `aggregate` is a higher-order function (no
    * whole-stage codegen), so the walk must run ONCE per row, not once
    * per output column. Accumulator slots: [ref_span, n_aligned,
    * n_clipped]. */
  private def opSums(pieces: Column): Column = {
    def inOps(op: Column, ops: String): Column =
      op.isin(ops.map(_.toString): _*)
    aggregate(pieces, array(lit(0L), lit(0L), lit(0L)), (acc, x) => {
      val op = substring(x, -1, 1)
      val n = x.substr(lit(1), length(x) - 1).cast("long")
      array(
        element_at(acc, 1) + when(inOps(op, "MDN=X"), n).otherwise(0L),
        element_at(acc, 2) + when(inOps(op, "M=X"), n).otherwise(0L),
        element_at(acc, 3) + when(inOps(op, "SH"), n).otherwise(0L))
    })
  }

  /** One row per mapped alignment:
    * (qname, flag, chr, pos, mapq, cigar, ref_span, n_aligned,
    * n_clipped, end_pos). */
  def alignments(lines: Dataset[String]): DataFrame = {
    val f = split(col("value"), "\t")
    val cigar = element_at(f, 6)
    val pieces = regexp_extract_all(cigar,
      lit("(\\d+)([MIDNSHP=X])"), lit(0))
    lines.toDF("value")
      .filter(!col("value").startsWith("@") && size(f) >= 11 &&
        cigar =!= "*" && element_at(f, 4).cast("long") > 0)
      .select(
        element_at(f, 1).as("qname"),
        element_at(f, 2).cast("int").as("flag"),
        element_at(f, 3).as("chr"),
        element_at(f, 4).cast("long").as("pos"),
        element_at(f, 5).cast("int").as("mapq"),
        cigar.as("cigar"),
        opSums(pieces).as("spans"))
      .select(col("qname"), col("flag"), col("chr"), col("pos"),
        col("mapq"), col("cigar"),
        element_at(col("spans"), 1).as("ref_span"),
        element_at(col("spans"), 2).as("n_aligned"),
        element_at(col("spans"), 3).as("n_clipped"),
        (col("pos") + element_at(col("spans"), 1) - 1).as("end_pos"))
  }
}
