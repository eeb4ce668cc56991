package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end checks for the Manager CLI dispatch: temp files in, parquet
  * out, driven through runTool with the shared test session. */
class ManagerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    Files.createTempDirectory("graft-manager").toString

  private def writeText(name: String, text: String): String = {
    val p = Files.createTempDirectory("graft-in").resolve(name)
    Files.writeString(p, text)
    p.toString
  }

  test("VcfConverter2 tool: VCF file to common-format parquet") {
    val vcf = writeText("a.vcf",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n" +
        "1\t100\t.\tA\tC\t10\tPASS\t.\tGT:AD:DP\t0/1:3,4:7\n" +
        "1\t200\t.\tG\tT\t10\tPASS\t.\tGT:AD:DP\t1/1:0,9:9\n")
    val out = tmpDir()
    Manager.runTool(spark, "VcfConverter2",
      Array("--inputFile", vcf, "--outDir", out))
    val df = spark.read.parquet(s"$out/common_format2")
    assert(df.count() == 2)
    assert(df.columns.contains("allele_depth"))
  }

  test("GenotypeCounts tool: per-strain tallies from the header strains") {
    val vcf = writeText("b.vcf",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n" +
        "1\t100\t.\tA\tC\t10\tPASS\t.\tGT:AD:DP\t0/1:3,4:7\t./.\n")
    val out = tmpDir()
    Manager.runTool(spark, "GenotypeCounts",
      Array("--inputFile", vcf, "--outDir", out))
    val rows = spark.read.parquet(s"$out/genotype_counts")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows == Map(("S1", "0/1") -> 1L, ("S2", "./.") -> 1L))
  }

  test("ConservationScore tool: wiggle to (chr,pos,score) parquet") {
    val wig = writeText("c.wig",
      "fixedStep chrom=chr1 start=100 step=1\n0.5\n0.25\n")
    val out = tmpDir()
    Manager.runTool(spark, "ConservationScore",
      Array("--inputFile", wig, "--outDir", out))
    assert(spark.read.parquet(s"$out/conservation").count() == 2)
  }

  test("unknown tool and missing option fail with usage") {
    val e = intercept[IllegalArgumentException] {
      Manager.runTool(spark, "NoSuchTool", Array.empty)
    }
    assert(e.getMessage.contains("unknown tool"))
    val m = intercept[IllegalArgumentException] {
      Manager.runTool(spark, "VcfConverter2", Array("--outDir", "/tmp/x"))
    }
    assert(m.getMessage.contains("missing --inputFile"))
  }
}
