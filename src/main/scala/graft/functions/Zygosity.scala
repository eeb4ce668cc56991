package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Zygosity column family, re-expressed as pure Column expressions
  * (whole-stage codegen, zero shuffle).
  *
  * Semantics derived from the behavior of the reference's zygosity
  * computation as invoked at VariantLoad3.java:317-346 (rgdcore
  * `edu.mcw.rgd.util.Zygosity`, observed behavior):
  *
  *  - percent-read of an allele = round(100 * alleleReads / totalReads)
  *  - status: 100% → "homozygous"; ≥85% → "possibly homozygous";
  *    else "heterozygous"
  *  - on chr X/Y for male ("M"/"P") samples outside the pseudo-autosomal
  *    regions: 100% → "hemizygous"; ≥85% → "probably hemizygous";
  *    else "possibly hemizygous"
  *  - possible-error flag "Y" when percent ≤ 15
  *  - num-alleles = count of {A,C,G,T} with reads > 0
  *  - ref-allele-called flag "Y" when the reference nucleotide had reads
  *
  * Thresholds (HOMOZYGOUS=100, POSSIBLY_HOMOZYGOUS=85,
  * PROBABLY_HEMIZYGOUS=85, POSSIBLE_ERROR=15) are the reference's
  * published constants.
  */
object Zygosity {
  val HomozygousPercent = 100
  val PossiblyHomozygousPercent = 85
  val ProbablyHemizygousPercent = 85
  val PossibleErrorPercent = 15

  /** Percent of reads supporting `alleleReads` out of total. Computed in
    * double (the reference uses float32; double is value-identical for
    * realistic read depths and lets the SQL oracle reproduce it). */
  def percentF(alleleReads: Column, total: Column): Column =
    when(total > 0, alleleReads.cast("double") * 100d / total.cast("double"))
      .otherwise(lit(0d))

  /** Integer percent-read exactly as the reference rounds it:
    * (int)(pct + 0.5). */
  def percentRead(alleleReads: Column, total: Column): Column =
    floor(percentF(alleleReads, total) + 0.5d).cast("long")

  /** Zygosity status from the float percent, sample gender and chromosome.
    * `inPar` marks positions inside a pseudo-autosomal region (callers
    * supply it from a PAR interval table; default false). */
  def status(pctF: Column, gender: Column, chr: Column,
             inPar: Column = lit(false)): Column = {
    val autosomalLike =
      when(pctF === HomozygousPercent.toDouble, "homozygous")
        .when(pctF >= PossiblyHomozygousPercent.toDouble, "possibly homozygous")
        .otherwise("heterozygous")
    val hemiLike =
      when(pctF === HomozygousPercent.toDouble, "hemizygous")
        .when(pctF >= ProbablyHemizygousPercent.toDouble, "probably hemizygous")
        .otherwise("possibly hemizygous")
    when((gender === "M" || gender === "P") && (chr === "X" || chr === "Y") && !inPar,
      hemiLike).otherwise(autosomalLike)
  }

  /** "Y"/"N" possible sequencing error: percent ≤ 15. */
  def possibleError(pctF: Column): Column =
    when(pctF <= PossibleErrorPercent.toDouble, "Y").otherwise("N")

  /** Number of distinct alleles with non-zero read counts. */
  def numAlleles(a: Column, c: Column, g: Column, t: Column): Column =
    Seq(a, c, g, t).map(x => when(x > 0, 1).otherwise(0)).reduce(_ + _)

  /** "Y" when the reference nucleotide itself was called at least once. */
  def refAlleleCalled(refNuc: Column, a: Column, c: Column, g: Column,
                      t: Column): Column = {
    val refReads =
      when(refNuc === "A", a).when(refNuc === "C", c)
        .when(refNuc === "G", g).when(refNuc === "T", t)
        .otherwise(lit(0))
    when(refReads > 0, "Y").otherwise("N")
  }

  /** Reads supporting the variant nucleotide. */
  def varReads(varNuc: Column, a: Column, c: Column, g: Column,
               t: Column): Column =
    when(varNuc === "A", a).when(varNuc === "C", c)
      .when(varNuc === "G", g).when(varNuc === "T", t)
      .otherwise(lit(0))
}
