package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SnpEff VCF-INFO annotation parsing (SnpEffLoader.java:130-167): pull
  * the `ANN=` entry out of the INFO field, split the comma-separated
  * annotations, split each annotation on '|' into typed columns — fully
  * declarative (regexp_extract + explode + split_part), codegen'd and
  * shuffle-free.
  */
object SnpEff {

  /** Fields of one SnpEff annotation, in ANN= order. */
  val fields: Seq[String] = Seq(
    "allele", "effect", "impact", "gene_symbol", "gene_id", "feature",
    "feature_id", "bio_type", "rank", "hgvs_c", "hgvs_p")

  /** The raw ANN= payload from an INFO string (null if absent). */
  def annPayload(info: Column): Column = {
    val x = regexp_extract(info, "(?:^|;)ANN=([^;]*)", 1)
    when(length(x) > 0, x)
  }

  /** Explode a DataFrame's INFO column into one row per SnpEff
    * annotation, with the first 11 typed fields as columns (empty
    * fields → null, like the reference's nullIfEmpty).
    *
    * Uses the custom [[graft.functions.SnpEffAnnotations]] Generator —
    * one imperative parse per row. (Two declarative drafts lost badly:
    * per-field split_part rescans the annotation n times, and a shared
    * split-to-array gets inlined into every consumer by projection
    * collapse, with conditionals blocking subexpression elimination.) */
  def parseAnnotations(df: DataFrame, infoCol: String): DataFrame =
    df.select(col("*"), graft.functions.SnpEffGen.annotations(col(infoCol)))
}
