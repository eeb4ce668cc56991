package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pseudo-autosomal regions of the human X/Y chromosomes — inside them a
  * male sample is diploid, so zygosity follows the autosomal ladder
  * rather than the hemizygous one (rgdcore PseudoAutosomalRegion,
  * observed constants).
  */
object Par {
  case class Region(chr: String, start: Long, stop: Long)

  /** GRCh37 PAR1 + PAR2 on X and Y. */
  val grch37: Seq[Region] = Seq(
    Region("X", 60001L, 2699520L),
    Region("X", 154931044L, 155260560L),
    Region("Y", 10001L, 2649520L),
    Region("Y", 59034050L, 59363566L))

  /** NCBI36 regions. */
  val build36: Seq[Region] = Seq(
    Region("X", 1L, 2709520L),
    Region("X", 154584238L, 154913754L),
    Region("Y", 57443438L, 57772954L))

  /** True when (chr, pos) falls in a pseudo-autosomal region. */
  def inPar(chr: Column, pos: Column,
            regions: Seq[Region] = grch37): Column =
    regions.map(r => chr === r.chr && pos.between(r.start, r.stop))
      .reduce(_ || _)

  /** "Y"/"N" zygosity-in-pseudo flag: set only for male X/Y calls inside
    * a PAR (the reference sets it in that branch alone). */
  def inPseudo(gender: Column, chr: Column, pos: Column,
               regions: Seq[Region] = grch37): Column =
    when((gender === "M" || gender === "P") && (chr === "X" || chr === "Y")
      && inPar(chr, pos, regions), "Y").otherwise("N")
}
