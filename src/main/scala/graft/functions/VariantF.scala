package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level re-expressions of the reference's per-variant scalar
  * derivations. All pure `functions._` compositions → whole-stage codegen,
  * no shuffle, no UDFs.
  *
  * Semantics derived from reference behavior at:
  *  - VariantLoad3.java:668-680 (`determineVariantType`)
  *  - VariantLoad3.java:299-315 (end-position derivation)
  *  - VariantLoad3.java:260-274 (total depth fallback + quality score)
  *  - VariantLoad3.java:348-353 (dbSnp vs novel on rsId presence)
  */
object VariantF {

  /** "insertion" when ref sequence empty, "deletion" when var sequence
    * empty, else "snv". (Reference: VariantLoad3.java:668-680.) */
  def variantType(refSeq: Column, varSeq: Column): Column =
    when(length(coalesce(refSeq, lit(""))) === 0, "insertion")
      .when(length(coalesce(varSeq, lit(""))) === 0, "deletion")
      .otherwise("snv")

  /** End position: snv → start+1; insertion → start; deletion →
    * start + len(ref). (Reference: VariantLoad3.java:299-315.) */
  def endPos(startPos: Column, refSeq: Column, varSeq: Column): Column = {
    val refLen = length(coalesce(refSeq, lit("")))
    val varLen = length(coalesce(varSeq, lit("")))
    when(refLen > 0 && varLen > 0, startPos + 1)      // snv
      .when(refLen === 0, startPos)                    // insertion
      .otherwise(startPos + refLen)                    // deletion
  }

  /** Total depth fallback: explicit DP if present, else sum of ACGT counts
    * for snvs / read depth for indels. (Reference: VariantLoad3.java:260-268.) */
  def totalDepth(dp: Column, isSnv: Column, a: Column, c: Column, g: Column,
                 t: Column, readDepth: Column): Column =
    when(dp.isNotNull && dp > 0, dp)
      .otherwise(when(isSnv, a + c + g + t).otherwise(readDepth))

  /** Integer-rounded percent of reads called vs analyzed:
    * (100*readDepth + totalDepth/2) / totalDepth with integer division,
    * 0 when totalDepth = 0. (Reference: VariantLoad3.java:270-274.) */
  def qualityScore(readDepth: Column, totalDepth: Column): Column =
    when(totalDepth > 0,
      floor((lit(100) * readDepth + floor(totalDepth / 2)) / totalDepth)
        .cast("long"))
      .otherwise(lit(0L))

  /** dbSnp when rsId present, novel otherwise.
    * (Reference: VariantLoad3.java:348-353.) */
  def dbSnpClass(rsId: Column): Column =
    when(rsId.isNotNull && length(rsId) > 0, "dbsnp").otherwise("novel")

  /** Frameshift flag: length difference between ref and var sequences not
    * divisible by 3. (Reference: VariantPostProcessing.java:607-611.) */
  def isFrameShift(refSeq: Column, varSeq: Column): Column =
    when(
      abs(length(coalesce(refSeq, lit(""))) - length(coalesce(varSeq, lit("")))) % 3 =!= 0,
      "T").otherwise("F")
}
