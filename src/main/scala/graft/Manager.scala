package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** CLI dispatch — the reference's Manager.java `--tool <name> <args>`
  * wrapper, re-expressed as path-in → parquet-out Spark flows.
  *
  * The reference's per-chromosome/per-sample shell fan-out
  * (`Manager.java:163`, dist scripts) exists because its tools are
  * single-threaded JDBC loops; here each tool is one declarative plan
  * that partitions over all chromosomes and samples at once, so the
  * orchestration surface shrinks to tool selection + paths. Converters
  * that need a caller-supplied column mapping (ClinVar2Vcf etc.) remain
  * library calls on [[graft.operators.SourceConverters]] — a CLI cannot
  * carry a schema contract.
  *
  * Tools: VcfConverter2, Vcf8ColConverter2, GenotypeCounts,
  * VariantLoad3 (parse + score), ConservationScore, VariantTypeFixUp,
  * FrameShiftFixUp.
  */
object Manager {

  val usage: String =
    """usage: Manager --tool <name> [tool args]
      |  VcfConverter2     --inputFile F --outDir D [--ADDP] [--processVariantsSameAsRef]
      |  Vcf8ColConverter2 --inputFile F --outDir D [--processVariantsSameAsRef]
      |  GenotypeCounts    --inputFile F --outDir D [--ADDP]
      |  VariantLoad3      --inputFile F --outDir D [--genders S1=M,S2=F] [--ADDP]
      |  ConservationScore --inputFile F --outDir D
      |  VariantTypeFixUp  --variants P --outDir D
      |  FrameShiftFixUp   --variants P --outDir D
      |  VariantRatLoaderFromDb --variants P [--batch P] [--chr C] --outDir D""".stripMargin

  def main(args: Array[String]): Unit = {
    // throw (non-zero exit) rather than print-and-return: a scripted
    // `Manager ... && next` must not proceed on an invalid invocation
    if (args.length < 2 || args(0) != "--tool")
      throw new IllegalArgumentException(usage)
    val spark = SparkSession.builder()
      .config("spark.master",
        sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    try runTool(spark, args(1), args.drop(2))
    finally spark.stop()
  }

  /** Dispatch one tool; separated from `main` so tests drive it with an
    * existing session. */
  def runTool(spark: SparkSession, tool: String, toolArgs: Array[String]): Unit = {
    val flags = toolArgs.filter(_.startsWith("--"))
      .map(_.drop(2)).toSet
    val opts = toolArgs.sliding(2).collect {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") =>
        k.drop(2) -> v
    }.toMap
    def opt(k: String): String =
      opts.getOrElse(k, throw new IllegalArgumentException(
        s"missing --$k for tool $tool\n$usage"))
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"${opt("outDir")}/$name")
    val addp = flags("ADDP")
    val sameAsRef = flags("processVariantsSameAsRef")

    tool match {
      case "VcfConverter2" =>
        write(VcfParser.fromPathPerFile(spark, opt("inputFile"),
          processVariantsSameAsRef = sameAsRef,
          processLinesWithMissingADDP = addp), "common_format2")

      case "Vcf8ColConverter2" =>
        write(VcfParser.parse8Col(
          spark.read.textFile(opt("inputFile")), sameAsRef), "common_format2")

      case "GenotypeCounts" =>
        write(VcfParser.genotypeCountsPerFile(spark, opt("inputFile"),
          processLinesWithMissingADDP = addp), "genotype_counts")

      case "VariantLoad3" =>
        val genders = opts.get("genders").map(_.split(",").map { kv =>
          kv.split("=", 2) match {
            case Array(s, g) if s.nonEmpty => s -> g
            case _ => throw new IllegalArgumentException(
              s"bad --genders entry '$kv' (want STRAIN=M|F)\n$usage")
          }
        }.toMap).getOrElse(Map.empty)
        val lines = spark.read.textFile(opt("inputFile"))
        val cf2 = VcfParser.parse(lines, VcfParser.headerStrains(lines),
          processLinesWithMissingADDP = addp)
        write(VariantPipeline.score(cf2, genders), "variants")

      case "ConservationScore" =>
        write(Conservation.parseFixedStep(
          spark.read.textFile(opt("inputFile"))), "conservation")

      case "VariantTypeFixUp" =>
        write(spark.read.parquet(opt("variants"))
          .withColumn("variant_type_computed",
            Fixups.variantTypeComputed(col("ref_nuc"), col("var_nuc"))),
          "variant_type_fixup")

      case "FrameShiftFixUp" =>
        write(spark.read.parquet(opt("variants"))
          .withColumn("frame_shift_computed",
            Fixups.frameShiftComputed(col("ref_nuc"), col("var_nuc"))),
          "frame_shift_fixup")

      case "VariantRatLoaderFromDb" =>
        // the re-load path (VariantRatLoaderFromDb.java:32-379): variants
        // come from the existing store, not CommonFormat2 files, and flow
        // through the same natural-key merge as a fresh load. No --batch
        // means self re-load, whose contract is idempotence: every row
        // classifies already_in_rgd and keeps its id, zero inserts. The
        // reference's per-chromosome fan-out (--chr) is a partition
        // filter here, not an orchestration loop.
        val key = Seq("chr", "pos", "end_pos", "ref_nuc", "var_nuc",
          "variant_type")
        val existing = spark.read.parquet(opt("variants"))
        val batch0 = opts.get("batch").map(spark.read.parquet(_))
          .getOrElse(existing)
        val batch = opts.get("chr")
          .map(c => batch0.filter(col("chr") === c)).getOrElse(batch0)
        val classified = VariantMerge.classify(
          batch.select(key.map(col): _*).distinct(), existing, key,
          "variant_id")
          // matches keep their store id; misses are assigned the same
          // deterministic natural-key id a fresh load would mint
          .withColumn("assigned_id",
            coalesce(col("existing_id"), xxhash64(key.map(col): _*)))
        write(classified, "reload")

      case other =>
        throw new IllegalArgumentException(s"unknown tool: $other\n$usage")
    }
  }
}
