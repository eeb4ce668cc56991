package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TranscriptAnnotator
import graft.operators.TranscriptAnnotator.{Annotated, FixedGenome}

/** Hand-derived expectations for the VariantPostProcessing pipeline.
  *
  * Genome chr1 = ATGGCCTAAGGGTTTCCC (1-based positions 1..18).
  */
class TranscriptAnnotatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genome = FixedGenome(Map("1" -> "ATGGCCTAAGGGTTTCCC"))

  private def run(variants: Seq[(Long, String, Long, String, String)],
                  transcripts: Seq[(Long, Long, String, Boolean)],
                  features: Seq[(Long, String, Long, Long)]): Map[(Long, Long), Annotated] = {
    val v = variants.toDF("var_id", "chr", "pos", "ref_nuc", "var_nuc")
    val g = Seq((1L, "1", 1L, 18L)).toDF("gene_id", "chr", "gstart", "gstop")
    val t = transcripts.toDF("tr_id", "gene_id", "strand", "non_coding")
    val f = features.toDF("tr_id", "ftype", "fstart", "fstop")
    TranscriptAnnotator.annotate(v, g, t, f, genome, binWidth = 8)
      .collect().map(a => (a.var_id, a.tr_id) -> a).toMap
  }

  test("plus-strand exonic SNV: GCC->GTC is A->V nonsynonymous at AA 2") {
    val out = run(
      variants = Seq((1L, "1", 5L, "C", "T")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 9L)))
    val a = out((1L, 10L))
    assert(a.location == "EXON" && a.syn_status.contains("nonsynonymous"))
    assert(a.ref_aa.contains("A") && a.var_aa.contains("V") && a.aa_pos.contains(2))
    assert(a.triplet_error == "F" && a.frame_shift.contains("F"))
  }

  test("second exon SNV accumulates relative position across exons") {
    // CDS = chunk(1,6) + chunk(10,18) = ATGGCC GGGTTTCCC; pos 11 is relPos 8
    // codon 3 GGG -> GAG = G -> E
    val out = run(
      variants = Seq((2L, "1", 11L, "G", "A")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 6L), (10L, "EXONS", 10L, 18L)))
    val a = out((2L, 10L))
    assert(a.syn_status.contains("nonsynonymous"))
    assert(a.ref_aa.contains("G") && a.var_aa.contains("E") && a.aa_pos.contains(3))
    // pos 11 is within 10bp of the second exon's start (10) -> near splice
    assert(a.near_splice_site == "T")
  }

  test("minus strand: reverse complement + flipped relative position") {
    // refDna revcomp(ATGGCCTAA) = TTAGGCCAT -> L,G,H; relPos 9-5+1=5 -> AA 2 G
    // varDna ATGGTCTAA -> revcomp TTAGACCAT -> L,D,H -> G->D nonsynonymous
    val out = run(
      variants = Seq((3L, "1", 5L, "C", "T")),
      transcripts = Seq((11L, 1L, "-", false)),
      features = Seq((11L, "EXONS", 1L, 9L)))
    val a = out((3L, 11L))
    assert(a.ref_aa.contains("G") && a.var_aa.contains("D"))
    assert(a.aa_pos.contains(2) && a.syn_status.contains("nonsynonymous"))
  }

  test("synonymous third-position change") {
    // pos 6: GCC -> GCA, both A
    val out = run(
      variants = Seq((4L, "1", 6L, "C", "A")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 9L)))
    assert(out((4L, 10L)).syn_status.contains("synonymous"))
  }

  test("intronic variant gets INTRON row with no AA call") {
    val out = run(
      variants = Seq((5L, "1", 8L, "A", "C")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 6L), (10L, "EXONS", 10L, 18L)))
    val a = out((5L, 10L))
    assert(a.location == "INTRON" && a.syn_status.isEmpty && a.ref_aa.isEmpty)
  }

  test("non-coding transcript short-circuits to NON-CODING") {
    val out = run(
      variants = Seq((6L, "1", 5L, "C", "T")),
      transcripts = Seq((12L, 1L, "+", true)),
      features = Seq((12L, "EXONS", 1L, 9L)))
    assert(out((6L, 12L)).location == "EXON,NON-CODING")
  }

  test("variant in 5'UTR-trimmed region: UTR location, no AA call") {
    val out = run(
      variants = Seq((7L, "1", 2L, "T", "A")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "5UTRS", 1L, 3L), (10L, "EXONS", 1L, 9L)))
    val a = out((7L, 10L))
    assert(a.location == "5UTRS,EXON")
    assert(a.syn_status.isEmpty)
  }

  test("transcript with no EXONS features still yields an INTRON row") {
    // reference emits a VARIANT_TRANSCRIPT with location INTRON when no
    // feature contains the variant (processChromosome "not found" branch)
    val out = run(
      variants = Seq((20L, "1", 5L, "C", "T")),
      transcripts = Seq((13L, 1L, "+", false)),
      features = Seq((99L, "EXONS", 1L, 9L))) // features of another transcript
    assert(out((20L, 13L)).location == "INTRON")
  }

  test("intronic variant on non-coding transcript: INTRON,NON-CODING") {
    // NON-CODING appends regardless of inExon (VariantPostProcessing:274-283)
    val out = run(
      variants = Seq((21L, "1", 8L, "A", "C")),
      transcripts = Seq((12L, 1L, "+", true)),
      features = Seq((12L, "EXONS", 1L, 6L), (12L, "EXONS", 10L, 18L)))
    assert(out((21L, 12L)).location == "INTRON,NON-CODING")
  }

  test("deletion: CDS rebuilt without the deleted base, trimmed to codons") {
    // ref C at pos 5 deleted: varDna ATGGCTAA -> trim ATGGCT -> M,A
    // aaPos 2: ref GCC=A, var GCT=A -> synonymous (reference trim quirk:
    // |9-6| = 3 -> frame_shift F, faithful to handleTranslatedProtein)
    val out = run(
      variants = Seq((22L, "1", 5L, "C", "")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 9L)))
    val a = out((22L, 10L))
    assert(a.ref_aa.contains("A") && a.var_aa.contains("A"))
    assert(a.syn_status.contains("synonymous") && a.frame_shift.contains("F"))
  }

  test("dash deletion removes len(var_nuc) bases, not len(ref)") {
    // ref='GCC', var='-' at pos 4: the reference's deletion branch
    // (VariantPostProcessing.java:473-479) removes varNuc.length()=1 base
    // — varDna atg_cctaa -> atgcctaa, trim 6 -> M,P; refAa A -> P
    val out = run(
      variants = Seq((26L, "1", 4L, "GCC", "-")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 9L)))
    val a = out((26L, 10L))
    assert(a.ref_aa.contains("A") && a.var_aa.contains("P"))
    assert(a.aa_pos.contains(2) && a.syn_status.contains("nonsynonymous"))
  }

  test("multi-dash deletion removes one base per dash") {
    // var='---' at pos 4 deletes 3 bases: atg[gcc]taa -> atgtaa -> M,*
    val out = run(
      variants = Seq((27L, "1", 4L, "GCC", "---")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 9L)))
    val a = out((27L, 10L))
    assert(a.ref_aa.contains("A") && a.var_aa.contains("*"))
    assert(a.frame_shift.contains("F"))
  }

  test("insertion (empty ref): base inserted before relPos") {
    // insert G before pos 5: varDna ATGGGCCTAA -> trim 9 -> M,G,L
    // aaPos 2: ref A, var G -> nonsynonymous
    val out = run(
      variants = Seq((23L, "1", 5L, "", "G")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 9L)))
    val a = out((23L, 10L))
    assert(a.ref_aa.contains("A") && a.var_aa.contains("G"))
    assert(a.syn_status.contains("nonsynonymous"))
  }

  test("minus-strand deletion: flip position against the REF length") {
    // del C at pos 5 on '-': refDna revcomp(ATGGCCTAA)=TTAGGCCAT -> L,G,H
    // varDna revcomp(ATGGCTAA)=TTAGCCAT -> trim 6 -> L,A
    // relP = 9-5+1 = 5 -> aaPos 2: G -> A nonsynonymous; |9-6|%3=0 -> F
    val out = run(
      variants = Seq((25L, "1", 5L, "C", "")),
      transcripts = Seq((11L, 1L, "-", false)),
      features = Seq((11L, "EXONS", 1L, 9L)))
    val a = out((25L, 11L))
    assert(a.ref_aa.contains("G") && a.var_aa.contains("A"))
    assert(a.aa_pos.contains(2) && a.syn_status.contains("nonsynonymous"))
    assert(a.frame_shift.contains("F") && a.triplet_error == "F")
  }

  test("VCF-style anchored insertion: suffix inserted after the anchor") {
    // ref C -> var CG at pos 5: varDna ATGGCGCTAA -> trim ATGGCGCTA
    // aaPos 2: GCC=A vs GCG=A -> synonymous
    val out = run(
      variants = Seq((24L, "1", 5L, "C", "CG")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 9L)))
    val a = out((24L, 10L))
    assert(a.ref_aa.contains("A") && a.var_aa.contains("A"))
    assert(a.syn_status.contains("synonymous"))
  }

  test("verifyIfInRgd drops already-loaded (variant, transcript) pairs") {
    val v = Seq((1L, "1", 5L, "C", "T"), (2L, "1", 6L, "C", "A"))
      .toDF("var_id", "chr", "pos", "ref_nuc", "var_nuc")
    val g = Seq((1L, "1", 1L, 18L)).toDF("gene_id", "chr", "gstart", "gstop")
    val t = Seq((10L, 1L, "+", false)).toDF("tr_id", "gene_id", "strand", "non_coding")
    val f = Seq((10L, "EXONS", 1L, 9L)).toDF("tr_id", "ftype", "fstart", "fstop")
    val ann = TranscriptAnnotator.annotate(v, g, t, f, genome, binWidth = 8)
    val existing = Seq((1L, 10L)).toDF("var_id", "tr_id")
    val out = TranscriptAnnotator.verifyIfInRgd(ann, existing).collect()
    assert(out.map(a => (a.var_id, a.tr_id)).toSet == Set((2L, 10L)))
  }

  test("Md5Genome matches the SQL definition") {
    // translate(substr(md5('1:5'),1,1),'0123456789abcdef','ACGTACGTACGTACGT')
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("1:5".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = "ACGTACGTACGTACGT"("0123456789abcdef".indexOf(hex.charAt(0)))
    assert(TranscriptAnnotator.Md5Genome().chunk("1", 5, 5) == expect.toString)
  }

  test("triplet error flagged when CDS length not divisible by 3") {
    val out = run(
      variants = Seq((8L, "1", 5L, "C", "T")),
      transcripts = Seq((10L, 1L, "+", false)),
      features = Seq((10L, "EXONS", 1L, 8L))) // 8 bases
    val a = out((8L, 10L))
    assert(a.triplet_error == "T")
    assert(a.syn_status.contains("nonsynonymous")) // still callable at AA 2
  }
}
