package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.functions.Par
import graft.operators.{VariantPipeline, VcfParser}

/** Streaming twin of the variant-load front end: [[VcfParser.parse]] is
  * one stateless `mapPartitions` and [[VariantPipeline.score]] is all
  * narrow column expressions, so the identical code runs under
  * Structured Streaming in append mode — `readStream` VCF lines in,
  * typed/scored/zygosity-annotated variant rows out, no state store,
  * no watermark needed. Downstream merge/dedup compose with
  * [[StreamDedup]]-style watermarked stages.
  */
object StreamVcf {

  /** Streaming lines → common-format-2 rows. */
  def commonFormat(lines: Dataset[String], strains: Seq[String],
                   processVariantsSameAsRef: Boolean = false,
                   processLinesWithMissingADDP: Boolean = false): DataFrame =
    VcfParser.parse(lines, strains, processVariantsSameAsRef,
      processLinesWithMissingADDP)

  /** Streaming lines → fully scored variant rows (VariantLoad3 stage). */
  def scored(lines: Dataset[String], strains: Seq[String],
             genders: Map[String, String],
             parRegions: Seq[Par.Region] = Par.grch37): DataFrame =
    VariantPipeline.score(commonFormat(lines, strains), genders, parRegions)

  /** Streaming per-(strain, genotype) tallies: the same gated
    * [[VcfParser.genotypeCounts]] aggregation as a running streaming
    * aggregate (complete/update output modes) — state is one row per
    * (strain, genotype), a few dozen entries regardless of input volume,
    * so no watermark is needed. The reference accumulates the identical
    * HashMap per strain over the run and dumps it at the end. */
  def genotypeCounts(lines: Dataset[String], strains: Seq[String],
                     processLinesWithMissingADDP: Boolean = false): DataFrame =
    VcfParser.genotypeCounts(lines, strains,
      processLinesWithMissingADDP)
}
