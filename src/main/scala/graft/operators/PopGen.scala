package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-site expected-homozygote fraction ×10⁸ as an exact long:
    * 1 − 2p(1−p) under Hardy–Weinberg, the E-term of the
    * method-of-moments inbreeding estimator (plink `--het` without the
    * small-sample correction — documented choice: the correction's
    * n/(n−1) factor varies per site with call count and would couple
    * the estimate to missingness patterns; the uncorrected MoM is the
    * classic F = (O(hom) − E(hom)) / (N − E(hom))). Rounding per SITE
    * makes the per-sample sum order-free (the hweChi4 discipline). */
  def expHomE8(p: Column): Column =
    round(lit(1.0e8) * (lit(1.0) - lit(2.0) * p * (lit(1.0) - p)))
      .cast("long")

  /** Per-sample method-of-moments inbreeding coefficient F over a
    * genotype-cell frame `(chr, pos, sample, gv)` with gv ∈ {0,1,2}
    * (the plink `--het` screen: F ≫ 0 flags consanguinity or sample
    * contamination-free excess homozygosity, F ≪ 0 flags mixture):
    * per-site cohort alt frequency from the called cells, polymorphic
    * sites only (0 < p < 1), [[expHomE8]] rounded PER SITE so the
    * per-sample sums are order-free, then
    * F = (O(hom) − E(hom)) / (N − E(hom)) per sample over its own
    * called sites (absent cells simply don't join — the estimator's
    * standard missingness behavior).
    *
    * Scale shape: one (chr,pos) partial-agg shuffle (sites-bounded),
    * one co-keyed join back onto the cells, one sample agg with
    * map-side partials — no window, no collect; every frame is sites-
    * or samples-bounded.
    *
    * @return (sample, n_sites, obs_hom, exp_hom_e8, f4) with
    *         f4 = F×10⁴ rounded
    */
  def inbreedingF(cells: DataFrame): DataFrame = {
    val site = cells.groupBy("chr", "pos").agg(
      count(lit(1)).as("n"),
      sum(when(col("gv") === 1, 1).otherwise(0)).as("n1"),
      sum(when(col("gv") === 2, 1).otherwise(0)).as("n2"))
    val p = altFreq(col("n"), col("n1"), col("n2"))
    val eh = site.filter(p > 0 && p < 1)
      .select(col("chr"), col("pos"), expHomE8(p).as("eh8"))
    cells.join(eh, Seq("chr", "pos"))
      .groupBy("sample").agg(
        count(lit(1)).as("n_sites"),
        sum(when(col("gv") =!= 1, 1L).otherwise(0L)).as("obs_hom"),
        sum("eh8").as("exp_hom_e8"))
      .select(col("sample"), col("n_sites"), col("obs_hom"),
        col("exp_hom_e8"),
        round(lit(10000.0) *
          (col("obs_hom") * lit(100000000L) - col("exp_hom_e8"))
            .cast("double") /
          (col("n_sites") * lit(100000000L) - col("exp_hom_e8"))
            .cast("double")).cast("long").as("f4"))
  }

  /** True when ref→var is a transition (purine↔purine A–G or
    * pyrimidine↔pyrimidine C–T); callers exclude ref == var rows. */
  def isTransition(ref: Column, vr: Column): Column =
    (ref === "A" && vr === "G") || (ref === "G" && vr === "A") ||
      (ref === "C" && vr === "T") || (ref === "T" && vr === "C")

  /** Hudson Fst estimator per site, numerator and denominator
    * separately (Bhatia/Patterson/Price/Price 2013 "Estimating and
    * interpreting FST" eq. 10 — the recommended two-population
    * estimator: unbiased under unequal sample sizes, and its
    * ratio-of-sums aggregation over sites is the consistent way to
    * roll windows up, unlike averaging per-site ratios).
    *
    * Inputs per site per population: alt-allele frequency `p` and the
    * HAPLOID sample count `m` (2·diploid n). num = (p1−p2)² −
    * p1(1−p1)/(m1−1) − p2(1−p2)/(m2−1); den = p1(1−p2) + p2(1−p1).
    *
    * Parity: each is computed in a FIXED operation order, ×10⁸-scaled
    * and rounded to an exact long ONCE per site (the hweChi4
    * discipline, two more digits because per-site values are small);
    * callers sum the longs per window and do ONE final division —
    * order-free sums, bit-identical ratio. Callers filter m1 > 1 &&
    * m2 > 1 (finite correction) and drop den8 == 0 (both pops fixed
    * for the same allele — Fst undefined). */
  def fstNum8(p1: Column, m1: Column, p2: Column, m2: Column): Column =
    round(((p1 - p2) * (p1 - p2)
      - p1 * (lit(1.0) - p1) / (m1 - lit(1.0))
      - p2 * (lit(1.0) - p2) / (m2 - lit(1.0))) * 100000000L).cast("long")

  def fstDen8(p1: Column, p2: Column): Column =
    round((p1 * (lit(1.0) - p2) + p2 * (lit(1.0) - p1)) * 100000000L)
      .cast("long")

  /** Pairwise linkage-disequilibrium r² ×10⁴ as an exact long, from the
    * integer dosage cross-moments of a site pair over their shared
    * samples: n pairs, s1 = Σg1, s2 = Σg2, s11 = Σg1², s22 = Σg2²,
    * s12 = Σg1g2 (g ∈ {0,1,2} dosages, so every sum is an exact
    * integer — the whole statistic is one integer formula plus a final
    * division). r² = (n·s12 − s1·s2)² / ((n·s11 − s1²)·(n·s22 − s2²)).
    * Callers filter both variance terms > 0 (monomorphic-in-sample
    * sites have undefined r²). */
  def ldR2e4(n: Column, s1: Column, s2: Column, s11: Column,
             s22: Column, s12: Column): Column = {
    val cov = n * s12 - s1 * s2
    val v1 = n * s11 - s1 * s1
    val v2 = n * s22 - s2 * s2
    round(lit(10000.0) * (cov * cov) / (v1 * v2)).cast("long")
  }

  /** Mendelian-inconsistency test for a biallelic trio of {0,1,2}
    * dosages: the child draws ONE allele from each parent, a parent
    * with dosage 0 can only transmit ref, dosage 2 only alt, dosage 1
    * either — so the feasible child dosages form the closed interval
    * [tmin(f)+tmin(m), tmax(f)+tmax(m)] with tmin(p) = [p=2],
    * tmax(p) = [p≠0]. Error iff the child falls outside. Covers every
    * textbook case (e.g. 0×0 → child must be 0; 2×2 → child must be 2;
    * 0×2 → child must be 1) in ONE integer interval check — exact
    * integers, zero parity risk.
    */
  def mendelConflict(f: Column, m: Column, c: Column): Column = {
    val cmin = when(f === 2, 1).otherwise(0) +
      when(m === 2, 1).otherwise(0)
    val cmax = when(f === 0, 0).otherwise(1) +
      when(m === 0, 0).otherwise(1)
    c < cmin || c > cmax
  }

  /** VanRaden genomic relationship matrix (GRM) entries per sample
    * pair (VanRaden 2008 method 1, the GCTA `--make-grm` estimator —
    * the kinship matrix a mixed-model GWAS fits as its random effect;
    * KING reads RELATEDNESS CLASSES robustly, the GRM is the
    * VARIANCE-COMPONENT input): over a pair's shared called sites,
    * G_ij = Σ_k (x_ik − 2p_k)(x_jk − 2p_k) / Σ_k 2p_k(1−p_k) with
    * x ∈ {0,1,2} and p_k the cohort alt frequency; polymorphic sites
    * only (a fixed site contributes 0/0).
    *
    * Parity: the per-cell centered dosage rounds ×10⁴ to a long ONCE
    * per (site, sample) and the per-site denominator term rounds ×10⁸
    * ONCE per site, so both pairwise sums are order-free exact longs
    * (the expHomE8 discipline); the 10⁸ scales cancel in the ratio and
    * ONE final double division produces grm4. Numerator products are
    * ≤ 4×10⁸ per site — exact longs far under 2⁵³, so the final
    * double casts are exact too.
    *
    * Scale shape: one (chr,pos) partial-agg shuffle (sites-bounded),
    * the site frame joined back co-keyed, then the popgen_ibs
    * site-keyed self-join — per-site fan-out bounded by samples², the
    * result a samples²-bounded rollup. No window, no collect.
    *
    * @param cells (chr, pos, sample, gv) with gv ∈ {0,1,2}
    * @return (s1, s2, n_shared, grm4), s1 < s2
    */
  def grmPairs(cells: DataFrame): DataFrame =
    grmOrderedPairs(cells).filter(col("s1") < col("s2"))

  /** The [[grmPairs]] derivation over ALL ordered pairs INCLUDING the
    * diagonal (G_ii uses z_i², the sample's own variance ratio) — the
    * full symmetric matrix frame [[grmPowerStep]] multiplies against.
    * Same rounding contract as [[grmPairs]]. */
  private[graft] def grmOrderedPairs(cells: DataFrame): DataFrame = {
    val site = cells.groupBy("chr", "pos").agg(
      count(lit(1)).as("n"),
      sum(when(col("gv") === 1, 1).otherwise(0)).as("n1"),
      sum(when(col("gv") === 2, 1).otherwise(0)).as("n2"))
    val p = altFreq(col("n"), col("n1"), col("n2"))
    val pk = site.filter(p > 0 && p < 1).select(col("chr"), col("pos"),
      p.as("p"),
      round(lit(1.0e8) * lit(2.0) * p * (lit(1.0) - p)).cast("long")
        .as("dq8"))
    val z = cells.join(pk, Seq("chr", "pos"))
      .select(col("chr"), col("pos"), col("sample"),
        round(lit(10000.0) * (col("gv") - lit(2.0) * col("p")))
          .cast("long").as("zq4"),
        col("dq8"))
    val a = z.select(col("chr"), col("pos"), col("sample").as("s1"),
      col("zq4").as("z1"), col("dq8"))
    val b = z.select(col("chr"), col("pos"), col("sample").as("s2"),
      col("zq4").as("z2"))
    a.join(b, Seq("chr", "pos"))
      .groupBy("s1", "s2").agg(
        count(lit(1)).as("n_shared"),
        sum(col("z1") * col("z2")).as("num"),
        sum("dq8").as("den8"))
      .select(col("s1"), col("s2"), col("n_shared"),
        round(lit(10000.0) * col("num").cast("double") /
          col("den8").cast("double")).cast("long").as("grm4"))
  }

  /** One distributed power-iteration step on the QUANTIZED GRM — the
    * first move of a PCA on the kinship matrix (population structure:
    * the top GRM eigenvector IS the leading ancestry axis a mixed
    * model or PC-correction regresses out; Patterson et al. 2006).
    *
    * Parity design: the matrix entries are the ×10⁴-ROUNDED exact
    * longs [[grmPairs]] already grades (one IEEE division each, both
    * engines identical), the start vector is md5-parity ±1 (exact, no
    * rand()), so the matvec v₁ = G₄·v₀ is an order-free exact-long
    * sum and the only new float step is the final normalization
    * r4 = v₁/max|v₁| ×10⁴ — one division. A float-true power step
    * would chain engine-order-dependent double sums; quantizing the
    * matrix first keeps every cross-engine step exact without
    * changing what the step computes (G₄/10⁴ differs from G by
    * ≤ 0.5×10⁻⁴ per entry).
    *
    * Scale shape: the [[grmOrderedPairs]] samples²-bounded frame, one
    * sample-sized rollup, a 1-row max crossed in. No window, no
    * collect.
    *
    * @return (sample, n_terms, v1, r4)
    */
  def grmPowerStep(cells: DataFrame): DataFrame = {
    val g = grmOrderedPairs(cells)
    val v0 = (pmod(conv(substring(md5(col("s2").cast("string")), 1, 6),
      16, 10).cast("long"), lit(2L)) * 2L - 1L)
    val v1 = g.select(col("s1"), (col("grm4") * v0).as("term"))
      .groupBy("s1").agg(count(lit(1)).as("n_terms"),
        sum("term").as("v1"))
    val mx = broadcast(v1.agg(max(abs(col("v1"))).as("mx")))
    v1.crossJoin(mx)
      .select(col("s1").as("sample"), col("n_terms"), col("v1"),
        when(col("mx") > 0,
          round(lit(10000.0) * col("v1").cast("double") /
            col("mx").cast("double")).cast("long")).as("r4"))
  }
}
