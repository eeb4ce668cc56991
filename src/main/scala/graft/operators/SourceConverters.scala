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

  /** ClinVar mapping (ClinVar2Vcf.writeVcfLine): ID = `RGDID:<id>;<name>`,
    * INFO = `DB:<rsId>` when an rs id is known, else empty. */
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
}
