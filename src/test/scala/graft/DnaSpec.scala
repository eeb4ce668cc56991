package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dna, DnaOps}
import org.apache.spark.unsafe.types.UTF8String

class DnaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(s: String): String =
    DnaOps.translate(UTF8String.fromString(s)).toString
  private def rc(s: String): String =
    DnaOps.reverseComplement(UTF8String.fromString(s)).toString

  test("translate: canonical codons") {
    assert(t("ATG") == "M")
    assert(t("TAA") == "*" && t("TAG") == "*" && t("TGA") == "*")
    assert(t("TGG") == "W")
    assert(t("ATGGCCTAA") == "MA*")
    // reference behavior: N/unknown base -> X
    assert(t("ANA") == "X")
    // trailing partial codon dropped
    assert(t("ATGGC") == "M")
    // lowercase input accepted
    assert(t("atg") == "M")
  }

  test("translate: full codon table spot checks") {
    assert(t("TTT") == "F" && t("TTA") == "L" && t("CTG") == "L")
    assert(t("ATT") == "I" && t("GTG") == "V" && t("TCT") == "S")
    assert(t("CCG") == "P" && t("ACA") == "T" && t("GCC") == "A")
    assert(t("TAT") == "Y" && t("CAT") == "H" && t("CAA") == "Q")
    assert(t("AAT") == "N" && t("AAA") == "K" && t("GAT") == "D")
    assert(t("GAA") == "E" && t("TGT") == "C" && t("CGA") == "R")
    assert(t("AGT") == "S" && t("AGA") == "R" && t("GGG") == "G")
  }

  test("reverse complement") {
    assert(rc("ACGT") == "ACGT") // palindrome
    assert(rc("AAGG") == "CCTT")
    assert(rc("acgtn") == "NACGT")
    assert(rc("A?.") == ".?T")
  }

  test("expressions run through codegen in a DataFrame plan") {
    val df = Seq("ATGGCCTAA", "acgt").toDF("dna")
      .select(Dna.translateDna(col("dna")).as("aa"),
        Dna.reverseComplement(col("dna")).as("rc"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) == ("MA*", "TTAGGCCAT"))
    assert(rows(1) == ("T", "ACGT"))
  }

  test("null propagates") {
    val df = Seq[Option[String]](None, Some("ATG")).toDF("dna")
      .select(Dna.translateDna(col("dna")).as("aa"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(None, Some("M")))
  }
}
