package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Sample dimension-table machinery — the reference's
  * convert/LoadRn6Rn7Samples.java (createSamples:217-270, getSampleId:
  * 200-215) and fixup/LoadSampleMetadata1000_3000.java (TSV-driven
  * per-row UPDATEs).
  *
  * Spark shape: the sample dim is file-listing-sized (one row per input
  * VCF — bounded by file count, not data volume), so sequential id
  * assignment is a sort + `zipWithIndex` (order-correct, distributed, no
  * unpartitioned window), and the metadata "UPDATE ... WHERE sample_id="
  * loop becomes one left-join column overlay.
  */
object SampleMeta {

  /** createSamples: one sample row per file ending in `suffix`, named by
    * the basename minus the suffix, with sequential ids `baseSampleId`,
    * `baseSampleId`+1, … in sample-name order (the reference's
    * directory-iteration counter, made deterministic by sorting). */
  def samplesFromFiles(files: DataFrame, pathCol: String, suffix: String,
                       baseSampleId: Long, mapKey: Int, patientId: Int,
                       gender: String, description: String): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    val named = files
      .select(element_at(split(col(pathCol), "/"), -1).as("fname"))
      .filter(col("fname").endsWith(suffix))
      .select(expr(s"substring(fname, 1, length(fname) - ${suffix.length})")
        .as("sample_name"))
    named.orderBy("sample_name").as[String].rdd.zipWithIndex()
      .map { case (name, i) => (baseSampleId + i, name) }
      .toDF("sample_id", "sample_name")
      .withColumn("description", lit(description))
      .withColumn("patient_id", lit(patientId))
      .withColumn("gender", lit(gender))
      .withColumn("map_key", lit(mapKey))
  }

  /** getSampleId: resolve one sample id by (name + suffix); fails on
    * ambiguity exactly like the reference's "multi sample names". */
  def sampleId(samples: DataFrame, analysisName: String,
               sampleNameSuffix: String = ""): Option[Long] = {
    val hits = samples
      .filter(col("sample_name") === (analysisName + sampleNameSuffix))
      .select("sample_id").limit(2).collect()
    if (hits.length > 1)
      throw new IllegalStateException(s"multi sample names: $analysisName")
    hits.headOption.map(_.getLong(0))
  }

  /** Parse a header-driven metadata TSV (first line = column names, first
    * column = sample_id; rows with an empty sample_id are skipped — the
    * reference's `continue`). */
  def parseMetadataTsv(spark: SparkSession, lines: Dataset[String]): DataFrame = {
    val df = spark.read.option("sep", "\t").option("header", "true")
      .csv(lines)
    val idCol = df.columns.head
    df.filter(col(idCol).isNotNull && col(idCol) =!= "")
      .withColumn(idCol, col(idCol).cast("long"))
      .withColumnRenamed(idCol, "sample_id")
  }

  /** The metadata fixup: overlay `meta`'s columns onto `samples` matched
    * on sample_id — the join-based analog of the reference's per-row
    * `UPDATE sample SET col=... WHERE sample_id=...` loop. Columns in
    * `meta` that exist in `samples` are overwritten where a metadata row
    * matches; samples without metadata pass through unchanged. */
  def applyMetadata(samples: DataFrame, meta: DataFrame): DataFrame = {
    val metaCols = meta.columns.filter(_ != "sample_id").toSeq
    // a metadata TSV is hand-maintained and dim-sized by construction —
    // broadcast it so the sample dim never shuffles for the overlay
    val m = broadcast(meta.select(col("sample_id") +:
      metaCols.map(c => col(c).as(s"__m_$c")): _*))
    val joined = samples.join(m, Seq("sample_id"), "left")
    val overlaid = metaCols.foldLeft(joined) { (df, c) =>
      if (samples.columns.contains(c))
        df.withColumn(c, coalesce(col(s"__m_$c"), col(c)))
      else df.withColumn(c, col(s"__m_$c"))
    }
    metaCols.foldLeft(overlaid)((df, c) => df.drop(s"__m_$c"))
  }
}
