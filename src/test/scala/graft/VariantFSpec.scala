package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VariantF

class VariantFSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("variant type + end pos follow VariantLoad3 rules") {
    val df = Seq(
      ("A", "C", 100L),     // snv
      ("", "CT", 100L),     // insertion
      ("ACG", "", 100L),    // deletion
      ("", "", 100L))       // degenerate: ref empty wins -> insertion
      .toDF("ref_seq", "var_seq", "start_pos")
      .select(
        VariantF.variantType(col("ref_seq"), col("var_seq")).as("vt"),
        VariantF.endPos(col("start_pos"), col("ref_seq"), col("var_seq")).as("ep"),
        VariantF.isFrameShift(col("ref_seq"), col("var_seq")).as("fs"))
    val r = df.collect()
    assert(r(0).getString(0) == "snv" && r(0).getLong(1) == 101L && r(0).getString(2) == "F")
    assert(r(1).getString(0) == "insertion" && r(1).getLong(1) == 100L && r(1).getString(2) == "T")
    // 3-base deletion keeps the reading frame: |Δlen| % 3 == 0 -> "F"
    assert(r(2).getString(0) == "deletion" && r(2).getLong(1) == 103L && r(2).getString(2) == "F")
    assert(r(3).getString(0) == "insertion")
  }

  test("quality score integer arithmetic incl. zero depth") {
    val df = Seq((40L, 50L), (50L, 50L), (1L, 3L), (10L, 0L))
      .toDF("rd", "td")
      .select(VariantF.qualityScore(col("rd"), col("td")).as("qs"))
    // (100*40 + 25)/50 = 80 (int div); (100*50+25)/50=100; (100+1)/3=33; td=0 -> 0
    assert(df.as[Long].collect().toSeq == Seq(80L, 100L, 33L, 0L))
  }

  test("dbsnp classification on rsId presence") {
    val df = Seq(Some("rs123"), Some(""), None).toDF("rs_id")
      .select(VariantF.dbSnpClass(col("rs_id")).as("c"))
    assert(df.as[String].collect().toSeq == Seq("dbsnp", "novel", "novel"))
  }
}
