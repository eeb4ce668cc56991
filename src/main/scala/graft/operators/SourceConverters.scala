package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** External-source → VCF converters — the convert/…2Vcf family
  * (ClinVar2Vcf.java:1-328, DbSnp2Vcf.java:1-493 over the shared
  * AbstractVariantDataMapper shape). Each source maps its columns onto
  * the same 10-column single-pseudo-sample VCF line with fixed read
  * counts (ref=8, var=1, depth=9 — ClinVar2Vcf.REF_COUNT/VAR_COUNT).
  *
  * The reference iterates a JDBC cursor and writes a file; here each
  * converter is a narrow projection over any DataFrame, preceded by the
  * reference's allele QC (qcVarNucAndRefNuc: both alleles non-empty and
  * composed of ACGTN, or the '-' placeholder).
  */
object SourceConverters {

  private val refCount = 8
  private val varCount = 1

  /** qcVarNucAndRefNuc (ClinVar2Vcf.java:188-219). */
  def alleleQc(ref: Column, vr: Column): Column = {
    def ok(c: Column) =
      c.isNotNull && length(c) > 0 &&
        (c === "-" || c.rlike("^[ACGTN]+$"))
    ok(ref) && ok(vr)
  }

  private def vcfLine(chr: Column, pos: Column, id: Column, ref: Column,
                      vr: Column, info: Column): Column =
    concat_ws("\t", chr, pos.cast("string"), id, ref, vr,
      lit("PASS"), lit("VALIDATED=1"), info, lit("GT;AD;DP"),
      lit(s"0/1:$refCount,$varCount:${refCount + varCount}"))

  /** The reference's ClinVar object-type gate (ClinVar2Vcf.java:83 —
    * the SELECT's `object_type in (...)` list; 'microsatellite' added
    * Feb 2025 per the reference changes.txt). Rows of any other type
    * (e.g. 'copy number gain', 'inversion', 'translocation') never
    * reach the VCF writer in the reference tool. */
  val ClinVarObjectTypes: Seq[String] = Seq(
    "single nucleotide variant", "deletion", "insertion", "duplication",
    "microsatellite")

  /** ClinVar mapping (ClinVar2Vcf.writeVcfLine): ID = `RGDID:<id>;<name>`,
    * INFO = `DB:<rsId>` when an rs id is known, else empty. This
    * overload applies the reference's default object-type gate
    * ([[ClinVarObjectTypes]]); the 8-arg overload skips it for callers
    * with pre-filtered (or type-less) frames. */
  def clinVarToVcf(df: DataFrame, chr: Column, pos: Column, rgdId: Column,
                   name: Column, ref: Column, vr: Column,
                   rsId: Column, objectType: Column): DataFrame =
    clinVarToVcf(df.filter(objectType.isin(ClinVarObjectTypes: _*)),
      chr, pos, rgdId, name, ref, vr, rsId)

  /** ClinVar mapping without the type gate (caller pre-filtered). */
  def clinVarToVcf(df: DataFrame, chr: Column, pos: Column, rgdId: Column,
                   name: Column, ref: Column, vr: Column,
                   rsId: Column): DataFrame =
    df.filter(alleleQc(ref, vr))
      .select(vcfLine(chr, pos,
        concat(lit("RGDID:"), rgdId.cast("string"), lit(";"), name),
        ref, vr,
        when(rsId.isNotNull && length(rsId) > 0,
          concat(lit("DB:"), rsId)).otherwise(lit(""))).as("line"))

  /** dbSnp mapping (DbSnp2Vcf.writeVcfLine): ID = snp name, empty INFO. */
  def dbSnpToVcf(df: DataFrame, chr: Column, pos: Column, snpName: Column,
                 ref: Column, vr: Column): DataFrame =
    df.filter(alleleQc(ref, vr))
      .select(vcfLine(chr, pos, snpName, ref, vr, lit("")).as("line"))

  /** GWAS Catalog mapping (GwasCat2Vcf.writeVcfLine:103-136) — column
    * for column the dbSnp line with ID = the catalog's snps field. */
  def gwasCatToVcf(df: DataFrame, chr: Column, pos: Column, snps: Column,
                   ref: Column, vr: Column): DataFrame =
    dbSnpToVcf(df, chr, pos, snps, ref, vr)

  /** Multi-sample TXT → VCF (Txt2Vcf.java:85-204): per row, the ref base
    * comes from the genome; the allele list is ref + each sample's
    * distinct non-N/H call in first-seen order; rows whose calls all
    * match the ref (or whose ref is 'N') are dropped. Sample columns:
    * 'N' → `./.:0,0`; 'H' (homozygote) → `1/i` with depth 9 on the first
    * ALT; otherwise `0/i` with depth 9 on the ref slot and the matching
    * allele. Inconsistent calls (allele not in the list — impossible by
    * construction here) would drop the row like the reference's
    * "consistency problem" branch.
    *
    * `calls` is an array column of per-sample calls aligned with
    * `sampleNames`. Runs as one narrow map with the genome evaluated
    * in-executor (broadcast-backed sources slice locally).
    */
  def txtToVcf(df: DataFrame, chr: Column, pos: Column, calls: Column,
               genome: graft.operators.TranscriptAnnotator.GenomeSource): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val g = genome
    df.select(chr.cast("string").as("chr"), pos.cast("long").as("pos"),
        calls.as("calls"))
      .as[(String, Long, Seq[String])]
      .mapPartitions { it =>
        it.flatMap { case (chrV, posV, callsV) =>
          val ref = g.chunk(chrV, posV, posV).toUpperCase
          if (ref.isEmpty || ref == "N") None
          else {
            val alleles = scala.collection.mutable.ArrayBuffer(ref)
            callsV.foreach { a =>
              if (a != "N" && a != "H" && !alleles.contains(a)) alleles += a
            }
            if (alleles.length <= 1) None
            else {
              val sb = new StringBuilder
              sb.append(chrV).append('\t').append(posV).append("\t.\t")
                .append(ref).append('\t')
                .append(alleles.tail.mkString(","))
                .append("\tPASS\tVALIDATED=1\t\tGT;AD")
              var ok = true
              callsV.foreach { a =>
                if (ok) {
                  if (a == "N") sb.append("\t./.:0,0")
                  else {
                    val target = if (a == "H") alleles(1) else a
                    val gtBase = if (a == "H") "1/" else "0/"
                    val idx = alleles.indexOf(target)
                    if (idx < 0 || (a == "H" && idx == 0)) ok = false
                    else {
                      val depths = new StringBuilder(
                        if (a == "H") ":0" else ":9")
                      var i = 1
                      while (i < alleles.length) {
                        depths.append(if (alleles(i) == target) ",9" else ",0")
                        i += 1
                      }
                      sb.append('\t').append(gtBase).append(idx).append(depths)
                    }
                  }
                }
              }
              if (ok) Some(sb.toString) else None
            }
          }
        }
      }.toDF("line")
  }
}
