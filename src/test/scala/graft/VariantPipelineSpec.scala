package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Par
import graft.operators.{TranscriptAnnotator, VariantPipeline}

class ParSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("PAR membership and zygosity interaction") {
    val df = Seq(
      ("X", 100000L, "M"),   // inside PAR1 GRCh37
      ("X", 5000000L, "M"),  // outside
      ("2", 100000L, "M"))   // autosome
      .toDF("chr", "pos", "gender")
    val out = df.select(
      Par.inPar(col("chr"), col("pos")).as("in_par"),
      Par.inPseudo(col("gender"), col("chr"), col("pos")).as("flag"),
      graft.functions.Zygosity.status(lit(100.0), col("gender"), col("chr"),
        Par.inPar(col("chr"), col("pos"))).as("status"))
      .collect()
    assert(out(0).getBoolean(0) && out(0).getString(1) == "Y" &&
      out(0).getString(2) == "homozygous") // diploid inside PAR
    assert(!out(1).getBoolean(0) && out(1).getString(1) == "N" &&
      out(1).getString(2) == "hemizygous") // haploid outside
    assert(out(2).getString(1) == "N" && out(2).getString(2) == "homozygous")
  }
}

/** End-to-end: VCF text through parse -> score -> merge -> annotate.
  * Genome chr1 = ATGGCCTAAGGGTTTCCC (as in TranscriptAnnotatorSpec). */
class VariantPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vcf = Seq(
    "##fileformat=VCFv4.2",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tSHR\tBN",
    // SNV at pos 5 C->T (A->V nonsynonymous per annotator spec), both strains
    "1\t5\trs5\tC\tT\t50\tPASS\t.\tGT:AD:DP\t0/1:7,3:10\t1/1:0,9:9",
    // SNV at pos 6 C->A (synonymous), SHR only; matches the existing set
    "1\t6\t.\tC\tA\t50\tPASS\t.\tGT:AD:DP\t0/1:5,5:10\t./.")

  test("full pipeline produces merged + annotated variants") {
    val existing = Seq(("1", 6L, 7L, "C", "A", "snv", 99L))
      .toDF("chr", "pos", "end_pos", "ref_nuc", "var_nuc", "variant_type", "variant_id")
    val genes = Seq((1L, "1", 1L, 18L)).toDF("gene_id", "chr", "gstart", "gstop")
    val transcripts = Seq((10L, 1L, "+", false))
      .toDF("tr_id", "gene_id", "strand", "non_coding")
    val features = Seq((10L, "EXONS", 1L, 9L))
      .toDF("tr_id", "ftype", "fstart", "fstop")

    val r = VariantPipeline.run(
      spark.createDataset(vcf), Seq("SHR", "BN"),
      genders = Map("SHR" -> "M", "BN" -> "F"),
      existing = existing, genes = genes, transcripts = transcripts,
      features = features,
      genome = TranscriptAnnotator.FixedGenome(Map("1" -> "ATGGCCTAAGGGTTTCCC")))

    // two distinct variants: (1,5,C,T) and (1,6,C,A)
    assert(r.variants.count() == 2)

    // three sample-detail rows: SHR@5, BN@5, SHR@6
    val det = r.sampleDetail.collect().map(x =>
      (x.getAs[String]("strain"), x.getAs[Int]("pos"),
        x.getAs[String]("zygosity_status"), x.getAs[Long]("zygosity_percent_read")))
    assert(det.length == 3)
    // zygosity denominator is the ACGT count sum (9), not DP: 9/9 -> 100%
    assert(det.contains(("BN", 5, "homozygous", 100L)))
    assert(det.contains(("SHR", 6, "heterozygous", 50L)))

    // merge: pos-6 variant already loaded, pos-5 is new
    val merged = r.merged.select("pos", "merge_action", "existing_id")
      .collect().map(x => (x.getAs[Int]("pos"), x.getAs[String]("merge_action"))).toSet
    assert(merged == Set((5, "insert"), (6, "already_in_rgd")))

    // annotation: pos 5 nonsynonymous A->V, pos 6 synonymous
    val ann = r.annotated.collect().map(a => a.syn_status.get).sorted
    assert(ann.toSeq == Seq("nonsynonymous", "synonymous"))
  }

  test("indel zygosity uses alleleDepth/readDepth (VariantLoad3 tweak)") {
    import org.apache.spark.sql.functions._
    // hand-built common-format rows: a deletion with AD 5 of 10 reads, an
    // insertion never called (alleleDepth 0 → dropped), and one where the
    // single-base ref still yields a ref-allele flag
    val noS = Option.empty[String]
    val noI = Option.empty[Int]
    val cf2 = Seq(
      ("S1", "1", 100, "AC", "", "", 0, 0, 0, 0, 10, noS, noI, 1, 5, 10),
      ("S1", "1", 200, "", "GT", "", 0, 0, 0, 0, 12, noS, noI, 1, 0, 12),
      ("S1", "1", 300, "A", "", "", 3, 0, 0, 0, 9, noS, noI, 1, 9, 9)
    ).toDF("strain", "chr", "pos", "ref_nuc", "var_nuc", "rs_id",
      "count_a", "count_c", "count_g", "count_t", "total_depth",
      "hgvs_name", "rgd_id", "allele_count", "allele_depth", "read_depth")
    val out = VariantPipeline.score(cf2, Map("S1" -> "F"))
      .select("pos", "variant_type", "zygosity_status",
        "zygosity_percent_read", "zygosity_ref_allele")
      .collect().map(r => r.getInt(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getString(4))).toMap
    // alleleDepth==0 insertion dropped like the reference's score==0 rule
    assert(out.keySet == Set(100, 300))
    // 5/10 reads → 50% heterozygous; multi-base ref → no ref-allele flag
    assert(out(100) == ("deletion", "heterozygous", 50L, null))
    // 9/9 → homozygous; single-base ref A with count_a>0 → "Y"
    assert(out(300) == ("deletion", "homozygous", 100L, "Y"))
  }
}
