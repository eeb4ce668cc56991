package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed VCF → "common format 2" conversion.
  *
  * Re-expresses VcfToCommonFormat2Converter.java:109-357: skip headers,
  * read the #CHROM header for strain names, then for each data line ×
  * strain × non-ref allele emit one flat row with ACGT read counts from
  * the AD field, total depth from DP, rsId / RGD id parsing.
  *
  * The reference streams one file through one JVM and keeps one output
  * file per strain. Here the whole VCF is a line Dataset: header
  * discovery is a tiny driver-side read of the first non-## line, and the
  * per-line fan-out (strains × alleles) is a pair of lateral explodes that
  * whole-stage-codegen compiles into one narrow pass — shuffle-free,
  * scaling to any number of files × strains.
  */
object VcfParser {

  /** Column layout of common format 2 (README "Common Format 2"). */
  val outputColumns: Seq[String] = Seq(
    "strain", "chr", "pos", "ref_nuc", "var_nuc", "rs_id",
    "count_a", "count_c", "count_g", "count_t", "total_depth",
    "hgvs_name", "rgd_id", "allele_count", "allele_depth", "read_depth")

  /** Parse VCF text lines. `strainNames` are the sample columns from the
    * #CHROM header (column 10 onward); pass what `headerStrains` returns.
    *
    * @param processVariantsSameAsRef also emit alleles equal to the ref
    *        (default false, like the reference)
    */
  def parse(lines: Dataset[String], strainNames: Seq[String],
            processVariantsSameAsRef: Boolean = false): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._

    val strains = array(strainNames.zipWithIndex.map { case (s, i) =>
      struct(lit(s).as("strain"), element_at($"v", i + 10).as("data"))
    }: _*)

    val base = lines.toDF("line")
      .filter(!$"line".startsWith("#") && length($"line") > 0)
      .withColumn("v", split($"line", "\t", -1))
      // chromosome: strip leading "chr", keep 1-2 char names (ref behavior)
      .withColumn("chr", regexp_replace(element_at($"v", 1), "^[Cc][Hh][Rr]", ""))
      .filter(length($"chr").between(1, 2))
      .withColumn("pos", element_at($"v", 2).cast("int"))
      .withColumn("id", element_at($"v", 3))
      .withColumn("ref_nuc", element_at($"v", 4))
      .withColumn("alt", element_at($"v", 5))
      // multi-allelic ALT lists are skipped by the reference converter
      .filter(!$"alt".contains(","))
      .withColumn("format", split(element_at($"v", 9), "[;:]"))
      .withColumn("ad_idx", array_position($"format", "AD").cast("int"))
      .withColumn("ad_idx",
        when($"ad_idx" === 0, array_position($"format", "CLCAD2").cast("int"))
          .otherwise($"ad_idx"))
      .withColumn("dp_idx", array_position($"format", "DP").cast("int"))
      .filter($"ad_idx" > 0 && $"dp_idx" > 0)
      // rsId / RGDID:...;hgvs parsing (reference lines 201-217)
      .withColumn("rgd_id",
        when($"id".startsWith("RGDID:") && $"id".contains(";"),
          regexp_extract($"id", "^RGDID:(\\d+);", 1).cast("int")))
      .withColumn("hgvs_name",
        when($"id".startsWith("RGDID:") && $"id".contains(";"),
          regexp_extract($"id", "^RGDID:\\d+;(.*)$", 1)))
      .withColumn("strain_data", explode(strains))
      .select($"chr", $"pos", $"ref_nuc", $"alt", $"id".as("rs_id"),
        $"ad_idx", $"dp_idx", $"rgd_id", $"hgvs_name",
        $"strain_data.strain".as("strain"), $"strain_data.data".as("data"))
      // genotype filter: "./.", ".", "0/0", "0" dropped (ref lines 377-391)
      .withColumn("gt", substring(element_at(split($"data", ":"), 1), 1, 3))
      .filter(!($"gt".isin("./.", ".", "0/0", "0")))
      .withColumn("fields", split($"data", ":"))
      .withColumn("ad_raw", element_at($"fields", $"ad_idx"))
      .withColumn("read_counts",
        when($"ad_raw" === ".", array(lit(0)))
          .otherwise(transform(split($"ad_raw", ","), _.cast("int"))))
      .withColumn("read_depth",
        aggregate($"read_counts", lit(0), (acc, x) => acc + coalesce(x, lit(0))))
      .withColumn("dp_raw", element_at($"fields", $"dp_idx"))
      .withColumn("total_depth",
        when($"dp_raw" === "." || $"dp_raw".isNull, 0).otherwise($"dp_raw".cast("int")))
      // alleles = ref + alts, with per-allele read counts by position
      .withColumn("alleles", concat(array($"ref_nuc"), split($"alt", ",")))
      .withColumn("allele_count", size(split($"alt", ",")))

    def countFor(nuc: String) = {
      val idx = array_position($"alleles", nuc).cast("int")
      when(idx > 0, coalesce(try_element_at($"read_counts", idx), lit(0))).otherwise(0)
    }

    val exploded = base
      .withColumn("var_nuc", explode($"alleles"))
      .filter(if (processVariantsSameAsRef) lit(true) else $"var_nuc" =!= $"ref_nuc")
      .withColumn("count_a", countFor("A"))
      .withColumn("count_c", countFor("C"))
      .withColumn("count_g", countFor("G"))
      .withColumn("count_t", countFor("T"))
      .withColumn("allele_depth", {
        val idx = array_position($"alleles", $"var_nuc").cast("int")
        when(idx > 0, coalesce(try_element_at($"read_counts", idx), lit(0))).otherwise(0)
      })

    exploded.select(outputColumns.map(col): _*)
  }

  /** Strain names from the #CHROM header line (columns 10+). */
  def headerStrains(lines: Dataset[String]): Seq[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.filter(l => l.startsWith("#") && !l.startsWith("##"))
      .take(1).headOption
      .map(_.drop(1).split("\t", -1).drop(9).toSeq)
      .getOrElse(Nil)
  }

  /** Convenience: read VCF file(s) from a path. */
  def fromPath(spark: SparkSession, path: String,
               processVariantsSameAsRef: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    parse(lines, headerStrains(lines), processVariantsSameAsRef)
  }
}
