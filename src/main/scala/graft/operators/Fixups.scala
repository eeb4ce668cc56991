package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's fixup family — full-table recompute passes that
  * compare a stored column against its recomputed value and update the
  * mismatches (fixup/VariantTypeFixUp.java, FrameShiftFixUp.java,
  * GenicStatusFixUp.java; the zygosity/num-allele window fixups are
  * `q8_window_fixup`).
  *
  * The reference streams a JDBC cursor and batches UPDATEs; here each
  * recompute is a narrow column expression (whole-stage codegen, no
  * shuffle) and the "update set" is just a filter — the caller joins it
  * back or overwrites the column, both declarative.
  */
object Fixups {

  /** Recomputed variant type — VariantTypeFixUp.java:48-63 branch ladder
    * ('-' anywhere → del; shorter ref → ins; longer ref → del; 1:1 →
    * snv; anything else is unknown → null). */
  def variantTypeComputed(ref: Column, vr: Column): Column =
    when(ref.contains("-") || vr.contains("-"), "del")
      .when(length(ref) < length(vr), "ins")
      .when(length(ref) > length(vr), "del")
      .when(length(ref) === 1 && length(vr) === 1, "snv")
      .otherwise(lit(null).cast("string"))

  /** Recomputed frameshift — FrameShiftFixUp.java:56-65: length diff is
    * the non-dash side's length for ins/del, |Δlen| otherwise; shift iff
    * not divisible by 3. */
  def frameShiftComputed(ref: Column, vr: Column): Column = {
    val lenDiff = when(vr.contains("-"), length(ref))
      .when(ref.contains("-"), length(vr))
      .otherwise(abs(length(ref) - length(vr)))
    when(lenDiff % 3 === 0, "F").otherwise("T")
  }

  /** Genic status per variant — GenicStatusFixUp.getGenicStatus: position
    * within any gene range. Left-semi binned range join, then the flag;
    * variants keep their other columns. */
  def withGenicStatus(variants: DataFrame, genes: DataFrame,
                      posCol: String = "pos", startCol: String = "gstart",
                      stopCol: String = "gstop", keys: Seq[String] = Seq("chr"),
                      binWidth: Long = 1 << 20): DataFrame = {
    // probe with DISTINCT positions: variants repeat positions and genes
    // overlap heavily, so deduping before the interval join divides its
    // fan-out by the position multiplicity (measured 6x at sf0.1).
    // Genic status is an EXISTENCE test, so the gene set is first
    // collapsed to its disjoint union spans (Intervals.mergeIntervals):
    // at ~42x interval overlap density (sf0.1 partGenes) the raw join
    // emits ~42 gene rows per covered point just to distinct them away —
    // merged spans are disjoint, so each point matches at most one and
    // the intermediate shrinks by the full overlap factor (3.6 s -> see
    // BASELINE.md r11 re-floor).
    val points = variants.select((keys :+ posCol).map(col): _*).distinct()
    val spans = Intervals.mergeIntervals(genes, keys, col(startCol),
      col(stopCol))
    val hits = RangeJoin.joined(points, spans, posCol, "mstart", "mstop",
        keys, binWidth)
      .select((keys :+ posCol).map(col): _*).distinct()
      .withColumn("__genic", lit(true))
    variants.join(hits, keys :+ posCol, "left")
      .withColumn("genic_status_computed",
        when(col("__genic").isNotNull, "genic").otherwise("intergenic"))
      .drop("__genic")
  }

  /** The fixup classification: rows whose stored column disagrees with
    * the recomputed value (null-safe, like Utils.stringsAreEqual). */
  def fixupAction(stored: Column, computed: Column): Column =
    when(stored <=> computed, "up_to_date").otherwise("update")
}
