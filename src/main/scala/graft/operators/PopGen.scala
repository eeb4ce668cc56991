package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Population-genetics QC primitives (the per-site audits a variant
  * warehouse runs after a load — the QC family next to the reference's
  * zygosity fixups; reference capability: per-variant genotype tallies,
  * VariantLoad3's strain counts):
  *
  *  - Hardy–Weinberg equilibrium chi-square (1 df) from per-site
  *    genotype counts — departures flag genotyping error, mapping
  *    artifacts, or population structure;
  *  - transition/transversion classification — whole-callset Ts/Tv is
  *    the standard one-number sanity check (~2 genome-wide, ~3 exome;
  *    ~0.5 = random noise).
  *
  * Everything is a narrow per-row formula over already-aggregated
  * integer counts — no shuffles of their own. Cross-engine parity: the
  * chi-square is computed with a FIXED operation order (the SQL twin
  * mirrors it term by term), scaled ×10⁴ and rounded to an exact long
  * once, so downstream sums and threshold comparisons are integer-exact
  * (the surprisal discipline applied to a test statistic).
  */
object PopGen {

  /** HWE chi² ×10⁴ as an exact long, from per-site genotype counts.
    * `n` = samples, `n0/n1/n2` = hom-ref / het / hom-alt counts.
    * Callers must filter to polymorphic sites (0 < p < 1) first — at
    * p ∈ {0, 1} an expected count is 0 and the statistic is undefined.
    *
    * Operation order is load-bearing for parity: alt-allele frequency
    * p = (2·n2 + n1) / (2·n), expectations e0 = n·(1−p)·(1−p),
    * e1 = 2·n·p·(1−p), e2 = n·p·p, χ² = Σ (obs−e)²/e with the terms in
    * 0,1,2 order — the oracle SQL spells the same sequence. */
  def hweChi4(n: Column, n0: Column, n1: Column, n2: Column): Column = {
    val p = (lit(2.0) * n2 + n1) / (lit(2.0) * n)
    val q = lit(1.0) - p
    val e0 = n * q * q
    val e1 = lit(2.0) * n * p * q
    val e2 = n * p * p
    val chi2 = (n0 - e0) * (n0 - e0) / e0 +
      (n1 - e1) * (n1 - e1) / e1 +
      (n2 - e2) * (n2 - e2) / e2
    round(chi2 * 10000).cast("long")
  }

  /** Alt-allele frequency of a site (exact-int ratio, one division). */
  def altFreq(n: Column, n1: Column, n2: Column): Column =
    (lit(2.0) * n2 + n1) / (lit(2.0) * n)

  /** True when ref→var is a transition (purine↔purine A–G or
    * pyrimidine↔pyrimidine C–T); callers exclude ref == var rows. */
  def isTransition(ref: Column, vr: Column): Column =
    (ref === "A" && vr === "G") || (ref === "G" && vr === "A") ||
      (ref === "C" && vr === "T") || (ref === "T" && vr === "C")
}
