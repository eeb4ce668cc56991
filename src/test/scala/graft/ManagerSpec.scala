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

  test("VariantLoad3 tool: parse + score to variants parquet") {
    val vcf = writeText("d.vcf",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n" +
        "1\t100\trs1\tA\tG\t50\tPASS\t.\tGT:AD:DP\t1/1:0,10:10\n")
    val out = tmpDir()
    Manager.runTool(spark, "VariantLoad3",
      Array("--inputFile", vcf, "--outDir", out, "--genders", "S1=M"))
    val r = spark.read.parquet(s"$out/variants").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("variant_type") == "snv")
    assert(row.getAs[Long]("quality_score") == 100L)
    assert(row.getAs[String]("zygosity_status") == "homozygous")
  }

  test("FrameShiftFixUp tool: recomputed column over a variants parquet") {
    val dir = tmpDir()
    import spark.implicits._
    Seq(("AC", "A"), ("A", "G")).toDF("ref_nuc", "var_nuc")
      .write.parquet(s"$dir/in")
    val out = tmpDir()
    Manager.runTool(spark, "FrameShiftFixUp",
      Array("--variants", s"$dir/in", "--outDir", out))
    val fs = spark.read.parquet(s"$out/frame_shift_fixup")
      .collect().map(r => r.getAs[String]("ref_nuc") ->
        r.getAs[String]("frame_shift_computed")).toMap
    assert(fs("AC") == "T" && fs("A") == "F")
  }

  test("VariantRatLoaderFromDb tool: self re-load is idempotent") {
    val dir = tmpDir()
    import spark.implicits._
    Seq(("1", 100L, 101L, "A", "G", "snv", 11L),
        ("1", 200L, 201L, "C", "T", "snv", 12L),
        ("2", 300L, 303L, "ACG", "", "del", 13L))
      .toDF("chr", "pos", "end_pos", "ref_nuc", "var_nuc", "variant_type",
        "variant_id")
      .write.parquet(s"$dir/store")
    val out = tmpDir()
    Manager.runTool(spark, "VariantRatLoaderFromDb",
      Array("--variants", s"$dir/store", "--outDir", out))
    val r = spark.read.parquet(s"$out/reload").collect()
    assert(r.length == 3)
    assert(r.forall(_.getAs[String]("merge_action") == "already_in_rgd"),
      "self re-load must produce zero inserts")
    assert(r.forall(x =>
      x.getAs[Long]("assigned_id") == x.getAs[Long]("existing_id")),
      "matches must keep their store ids")
  }

  test("VariantRatLoaderFromDb tool: new batch rows insert, --chr filters") {
    val dir = tmpDir()
    import spark.implicits._
    Seq(("1", 100L, 101L, "A", "G", "snv", 11L))
      .toDF("chr", "pos", "end_pos", "ref_nuc", "var_nuc", "variant_type",
        "variant_id")
      .write.parquet(s"$dir/store")
    // batch: the stored variant + one novel + one on another chromosome
    Seq(("1", 100L, 101L, "A", "G", "snv"),
        ("1", 500L, 501L, "G", "C", "snv"),
        ("2", 900L, 901L, "T", "A", "snv"))
      .toDF("chr", "pos", "end_pos", "ref_nuc", "var_nuc", "variant_type")
      .write.parquet(s"$dir/batch")
    val out = tmpDir()
    Manager.runTool(spark, "VariantRatLoaderFromDb",
      Array("--variants", s"$dir/store", "--batch", s"$dir/batch",
        "--chr", "1", "--outDir", out))
    val r = spark.read.parquet(s"$out/reload").collect()
    assert(r.length == 2, "--chr 1 must drop the chr-2 batch row")
    val byPos = r.map(x => x.getAs[Long]("pos") -> x).toMap
    assert(byPos(100L).getAs[String]("merge_action") == "already_in_rgd")
    assert(byPos(100L).getAs[Long]("assigned_id") == 11L)
    assert(byPos(500L).getAs[String]("merge_action") == "insert")
    assert(byPos(500L).isNullAt(byPos(500L).fieldIndex("existing_id")))
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

  test("Bench CLI: /-prefixed arg is the sf dir, the rest filter queries") {
    assert(Bench.parseArgs(Array[String]()) == ((None, Set.empty[String])))
    assert(Bench.parseArgs(Array("/root/testdata/sf0.01", "q1_pricing_summary")) ==
      ((Some("/root/testdata/sf0.01"), Set("q1_pricing_summary"))))
    // path position is free (Bench-only convention; Verify itself is
    // strictly positional) and env-only (no path) still works
    assert(Bench.parseArgs(Array("ann_pq", "/data/sf1", "ann_ivf")) ==
      ((Some("/data/sf1"), Set("ann_pq", "ann_ivf"))))
  }
}
