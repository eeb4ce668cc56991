package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** VCF allele normalization — the `bcftools norm` core (Tan, Abecasis
  * & Kang 2015 "Unified representation of genetic variants"): split
  * multi-allelic records into one row per ALT, then reduce each
  * (ref, alt) pair to its parsimonious form by trimming shared bases.
  * Reference adjacency: the pipeline's converters assume normalized
  * inputs (one variant per row, minimal alleles); this is the pass
  * that makes that true — two callers writing `ACG>AC,A` and `CG>C`
  * for the same deletion merge ONLY after normalization, so skipping
  * it silently double-loads variants.
  *
  * Trim rule (the bcftools order, applied identically in the DuckDB
  * oracle's recursive CTE): repeatedly (1) drop a shared LAST base
  * while both alleles keep length > 1, else (2) drop a shared FIRST
  * base while both keep length > 1, advancing pos — until neither
  * applies. Deterministic; terminates in ≤ len steps.
  *
  * Spark shape: the split is one `posexplode` (bounded by the ALT
  * count); the trim loop runs imperatively inside ONE `mapPartitions`
  * pass (the VcfParser discipline — a per-row variable-length loop is
  * exactly what the parse kernels do; no interpreted HOF in a
  * corpus-sized stage, no UDF registry). Nothing shuffles.
  */
object VcfNorm {

  case class NormVariant(chr: Long, pos: Long, ref: String, alt: String,
                         allele_idx: Int, n_alts: Int)

  /** @param variants (chr: long, pos: long, ref: string,
    *                  alts: array<string>)
    * @return one NORMALIZED row per (record, alt) */
  def splitAndTrim(variants: DataFrame): Dataset[NormVariant] = {
    val spark = variants.sparkSession
    import spark.implicits._
    variants
      .select(col("chr").cast("long"), col("pos").cast("long"),
        col("ref").cast("string"), col("alts"),
        size(col("alts")).as("n_alts"))
      .select(col("chr"), col("pos"), col("ref"), col("n_alts"),
        posexplode(col("alts")).as(Seq("idx", "alt")))
      .as[(Long, Long, String, Int, Int, String)]
      .mapPartitions(_.map { case (chr, pos0, ref0, nAlts, idx, alt0) =>
        var pos = pos0; var ref = ref0; var alt = alt0
        var done = false
        while (!done) {
          if (ref.length > 1 && alt.length > 1 &&
              ref.charAt(ref.length - 1) == alt.charAt(alt.length - 1)) {
            ref = ref.substring(0, ref.length - 1)
            alt = alt.substring(0, alt.length - 1)
          } else if (ref.length > 1 && alt.length > 1 &&
              ref.charAt(0) == alt.charAt(0)) {
            ref = ref.substring(1); alt = alt.substring(1); pos += 1
          } else done = true
        }
        NormVariant(chr, pos, ref, alt, idx, nAlts)
      })
  }
}
