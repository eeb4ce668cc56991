package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-assembly feature census — fixup/FeatureCount.java:18-113.
  *
  * The reference walks every gene → transcript → feature list through
  * JDBC, rebuilding each transcript's "model features" (exons split
  * against the transcript's single UTR3/UTR5 region into UTR and CDS
  * pieces — getModelFeatures/handleUtr, FeatureCount.java:116-242) and
  * tallying counts per chromosome in TreeMaps.
  *
  * Spark shape: the per-exon split is a pure function of
  * (exon, utr3 region, utr5 region), so the whole census is one
  * case-expression over an exon×UTR join followed by three keyed
  * aggregations — no driver loop, no per-transcript state. The case
  * ladder mirrors handleUtr exactly:
  *
  *   - exon disjoint from both UTRs  → whole exon is CDS
  *   - UTR covers the exon (case 1a) → one UTR piece, no CDS
  *   - UTR covers the left/right end (1b/1c) → one UTR + one CDS piece
  *   - UTR strictly inside the exon (1d) → nothing emitted, transcript
  *     flagged "has issues"
  *
  * UTR3 is tested before UTR5, and a hit short-circuits — an exon
  * overlapping both counts only against UTR3 (the reference's
  * `continue`).
  */
object FeatureCount {

  /** @param genes       gene_id, chr
    * @param transcripts tr_id, gene_id
    * @param features    tr_id, ftype ('EXONS'|'3UTRS'|'5UTRS'), fstart, fstop
    * @return per-chr census: n_genes, n_mapped_genes (≥1 transcript),
    *         n_transcripts, n_exons, n_utr3, n_utr5, n_cds,
    *         n_tr_issues (transcripts with ≥1 case-1d exon)
    */
  def rollup(genes: DataFrame, transcripts: DataFrame,
             features: DataFrame): DataFrame = {
    // one UTR3 + one UTR5 region per transcript (reference assumption)
    val utrs = features.filter(col("ftype").isin("3UTRS", "5UTRS"))
      .groupBy("tr_id")
      .agg(min(when(col("ftype") === "3UTRS", col("fstart"))).as("u3s"),
        min(when(col("ftype") === "3UTRS", col("fstop"))).as("u3e"),
        min(when(col("ftype") === "5UTRS", col("fstart"))).as("u5s"),
        min(when(col("ftype") === "5UTRS", col("fstop"))).as("u5e"))

    val ex = features.filter(col("ftype") === "EXONS")
      .join(utrs, Seq("tr_id"), "left")

    def overlaps(us: Column, ue: Column): Column =
      us.isNotNull && col("fstop") >= us && col("fstart") <= ue
    // handleUtr's case letters; 'd' = UTR strictly inside the exon
    def utrCase(us: Column, ue: Column): Column =
      when(col("fstart") >= us && col("fstop") <= ue, "a")
        .when(col("fstart") >= us && col("fstop") > ue, "b")
        .when(col("fstart") < us && col("fstop") <= ue, "c")
        .otherwise("d")
    val cls =
      when(overlaps(col("u3s"), col("u3e")),
        concat(lit("3"), utrCase(col("u3s"), col("u3e"))))
      .when(overlaps(col("u5s"), col("u5e")),
        concat(lit("5"), utrCase(col("u5s"), col("u5e"))))
      .otherwise(lit("x")) // disjoint: whole exon becomes CDS

    val perTr = ex.withColumn("cls", cls)
      .groupBy("tr_id")
      .agg(count(lit(1)).as("n_exons"),
        sum(when(col("cls").isin("3a", "3b", "3c"), 1).otherwise(0)).as("n_utr3"),
        sum(when(col("cls").isin("5a", "5b", "5c"), 1).otherwise(0)).as("n_utr5"),
        sum(when(col("cls").isin("3b", "3c", "5b", "5c", "x"), 1).otherwise(0))
          .as("n_cds"),
        max(when(col("cls").isin("3d", "5d"), 1).otherwise(0)).as("has_issue"))

    // transcript census keyed by the gene's chromosome; transcripts with
    // no exon features still count (0 features, no issue)
    val trAgg = transcripts
      .join(genes.select("gene_id", "chr"), "gene_id")
      .join(perTr, Seq("tr_id"), "left")
      .groupBy("chr")
      .agg(count(lit(1)).as("n_transcripts"),
        coalesce(sum("n_exons"), lit(0L)).as("n_exons"),
        coalesce(sum("n_utr3"), lit(0L)).as("n_utr3"),
        coalesce(sum("n_utr5"), lit(0L)).as("n_utr5"),
        coalesce(sum("n_cds"), lit(0L)).as("n_cds"),
        coalesce(sum("has_issue"), lit(0L)).as("n_tr_issues"))

    val geneAgg = genes
      .join(transcripts.select("gene_id").distinct()
        .withColumn("mapped", lit(1)), Seq("gene_id"), "left")
      .groupBy("chr")
      .agg(count(lit(1)).as("n_genes"),
        sum(coalesce(col("mapped"), lit(0))).as("n_mapped_genes"))

    geneAgg.join(trAgg, Seq("chr"), "full")
      .select(col("chr"),
        coalesce(col("n_genes"), lit(0L)).as("n_genes"),
        coalesce(col("n_mapped_genes"), lit(0L)).as("n_mapped_genes"),
        coalesce(col("n_transcripts"), lit(0L)).as("n_transcripts"),
        coalesce(col("n_exons"), lit(0L)).as("n_exons"),
        coalesce(col("n_utr3"), lit(0L)).as("n_utr3"),
        coalesce(col("n_utr5"), lit(0L)).as("n_utr5"),
        coalesce(col("n_cds"), lit(0L)).as("n_cds"),
        coalesce(col("n_tr_issues"), lit(0L)).as("n_tr_issues"))
  }
}
