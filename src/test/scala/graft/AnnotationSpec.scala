package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Polyphen, SnpEff}

class SnpEffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ANN payload extraction and per-annotation explode") {
    val df = Seq(
      "DP=10;ANN=A|missense_variant|MODERATE|Kcnj1|ID1|transcript|T1|protein_coding|1|c.1A>G|p.K1E,G|synonymous_variant|LOW|Kcnj1|ID1|transcript|T2|protein_coding|||",
      "DP=5;OTHER=x",                  // no ANN -> dropped
      "ANN=T|stop_gained|HIGH||||||||") // ANN first, empty gene -> null
      .toDF("info")
    val out = SnpEff.parseAnnotations(df, "info")
      .select("allele", "effect", "impact", "gene_symbol").collect()
    assert(out.length == 3)
    assert(out(0).getString(1) == "missense_variant" && out(0).getString(2) == "MODERATE")
    assert(out(1).getString(1) == "synonymous_variant" && out(1).getString(3) == "Kcnj1")
    assert(out(2).getString(1) == "stop_gained" && out(2).getString(3) == null)
  }
}

class PolyphenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AA windows clamp at sequence boundaries") {
    val df = Seq(("MKTAYIAKQR", 1), ("MKTAYIAKQR", 5), ("MKTAYIAKQR", 10))
      .toDF("protein", "pos")
      .select(Polyphen.refAa(col("protein"), col("pos")).as("aa"),
        Polyphen.aaWindow(col("protein"), col("pos"), flank = 2).as("w"))
    val rows = df.as[(String, String)].collect()
    assert(rows(0) == ("M", "MKTAY"))  // clamped left, window from start
    assert(rows(1) == ("Y", "TAYIA"))  // centered
    assert(rows(2) == ("R", "KQR"))    // truncated right
  }

  test("fasta 70-char chunking") {
    val seq70x2 = "A" * 70 + "B" * 30
    val lines = Seq(seq70x2).toDF("s")
      .select(Polyphen.fastaLines(col("s")).as("line"))
      .as[String].collect()
    assert(lines.toSeq == Seq("A" * 70, "B" * 30))
  }

  test("fastaForMissing: anti-join, dedup, wrap, no empty trailing line") {
    val attempted = Seq(
      ("P1", "A" * 140),      // exactly 2 full lines: trailing split dropped
      ("P1", "A" * 140),      // duplicate attempt: one record
      ("P2", "C" * 75),       // known -> excluded
      ("P3", "G" * 10))
      .toDF("protein_id", "protein_seq")
    val known = Seq("P2").toDF("protein_id")
    val out = Polyphen.fastaForMissing(attempted, known)
      .orderBy("protein_id", "line_no")
      .as[(String, Long, String)].collect().toSeq
    assert(out == Seq(
      ("P1", 0L, ">P1"), ("P1", 1L, "A" * 70), ("P1", 2L, "A" * 70),
      ("P3", 0L, ">P3"), ("P3", 1L, "G" * 10)))
  }
}
