package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Zygosity

class ZygositySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (a, c, g, t, refNuc, varNuc, gender, chr)
  private val rows = Seq(
    (0L, 10L, 0L, 0L, "A", "C", "F", "1"),   // 100% -> homozygous
    (1L, 9L, 0L, 0L, "A", "C", "F", "1"),    // 90% -> possibly homozygous
    (5L, 5L, 0L, 0L, "A", "C", "F", "1"),    // 50% -> heterozygous
    (9L, 1L, 0L, 0L, "A", "C", "F", "1"),    // 10% -> het + possible error
    (0L, 10L, 0L, 0L, "A", "C", "M", "X"),   // male X 100% -> hemizygous
    (1L, 9L, 0L, 0L, "A", "C", "M", "Y"),    // male Y 90% -> probably hemizygous
    (5L, 5L, 0L, 0L, "A", "C", "M", "X"),    // male X 50% -> possibly hemizygous
    (0L, 10L, 0L, 0L, "A", "C", "M", "2"))   // male autosome -> normal ladder

  private def compute() = {
    val df = rows.toDF("a", "c", "g", "t", "ref_nuc", "var_nuc", "gender", "chr")
    val total = col("a") + col("c") + col("g") + col("t")
    val vr = Zygosity.varReads(col("var_nuc"), col("a"), col("c"), col("g"), col("t"))
    val pct = Zygosity.percentF(vr, total)
    df.select(
      Zygosity.status(pct, col("gender"), col("chr")).as("status"),
      Zygosity.percentRead(vr, total).as("pct_read"),
      Zygosity.possibleError(pct).as("err"),
      Zygosity.numAlleles(col("a"), col("c"), col("g"), col("t")).as("num"),
      Zygosity.refAlleleCalled(col("ref_nuc"), col("a"), col("c"), col("g"), col("t")).as("refcalled"))
      .collect()
  }

  test("status ladder and hemizygous branch match reference thresholds") {
    val r = compute()
    assert(r(0).getString(0) == "homozygous")
    assert(r(1).getString(0) == "possibly homozygous")
    assert(r(2).getString(0) == "heterozygous")
    assert(r(3).getString(0) == "heterozygous" && r(3).getString(2) == "Y")
    assert(r(4).getString(0) == "hemizygous")
    assert(r(5).getString(0) == "probably hemizygous")
    assert(r(6).getString(0) == "possibly hemizygous")
    assert(r(7).getString(0) == "homozygous")
  }

  test("percent read rounds like the reference (int)(pct+0.5)") {
    val r = compute()
    assert(r(0).getLong(1) == 100L)
    assert(r(1).getLong(1) == 90L)
    assert(r(3).getLong(1) == 10L)
  }

  test("allele accounting") {
    val r = compute()
    assert(r(0).getInt(3) == 1)      // only C called
    assert(r(1).getInt(3) == 2)      // A and C called
    assert(r(0).getString(4) == "N") // ref A never called
    assert(r(1).getString(4) == "Y") // ref A called once
  }
}
