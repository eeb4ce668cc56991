package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VcfParser

class Vcf8ColSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("8-col VCF: AC depths, ref-depth imputation, multi-allelic rows") {
    val lines = spark.createDataset(Seq(
      "##fileformat=VCFv4.0",
      // ref G not in ALT; AC=9,4 DP=16 -> imputed G depth 3
      "1\t100\trs1\tG\tA,C\t.\t.\tEND=64603;DP=16;AC=9,4",
      // no AC: allele depth = DP
      "2\t200\t.\tA\tT\t.\t.\tDP=7",
      // bad chromosome skipped
      "chrUn_x\t5\t.\tA\tC\t.\t.\tDP=5"))
    val out = VcfParser.parse8Col(lines).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getString(4), r.getInt(6),
        r.getInt(7), r.getInt(8), r.getInt(9), r.getInt(14), r.getInt(15)))
    // (chr,pos,var,cA,cC,cG,cT,allele_depth,read_depth)
    assert(out.length == 3)
    val at100 = out.filter(_._2 == 100).sortBy(_._3)
    // alleles A(9), C(4), imputed G(3): counts visible from every row
    assert(at100.toSeq == Seq(
      ("1", 100, "A", 9, 4, 3, 0, 9, 16),
      ("1", 100, "C", 9, 4, 3, 0, 4, 16)))
    val at200 = out.find(_._2 == 200).get
    assert(at200._3 == "T" && at200._7 == 7 && at200._8 == 7)
  }

  test("8-col VCF: sameAsRef emits the ref allele; no DP drops the line") {
    val lines = spark.createDataset(Seq(
      "1\t100\t.\tG\tG,A\t.\t.\tDP=10;AC=6,4", // ref among ALTs
      "1\t200\t.\tA\tC\t.\t.\tAC=5"))          // DP missing: dropped
    val dflt = VcfParser.parse8Col(lines).collect()
    assert(dflt.map(_.getString(4)).toSeq == Seq("A")) // G=ref suppressed
    val withRef = VcfParser.parse8Col(lines, processVariantsSameAsRef = true)
      .collect().map(r => r.getString(4) -> r.getInt(14)).toMap
    assert(withRef == Map("G" -> 6, "A" -> 4))
  }

  test("8-col VCF: NC_ accessions resolve through the accession map") {
    val lines = spark.createDataset(Seq(
      "NC_005100.4\t50\t.\tA\tG\t.\t.\tDP=9;AC=9"))
    assert(VcfParser.parse8Col(lines).count() == 0) // unmapped: rejected
    val out = VcfParser.parse8Col(lines,
      accessionMap = Map("NC_005100.4" -> "2")).collect()
    assert(out.length == 1 && out.head.getString(1) == "2")
  }
}
