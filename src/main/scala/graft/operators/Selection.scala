package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Dedup.normText

/** Data-selection operators for training-corpus construction: DSIR
  * importance scoring (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling") and a fastText-style hashed
  * linear quality classifier (Joulin et al. 2016 architecture — the
  * CCNet / LLaMA-pipeline quality-filter shape).
  *
  * Both use the hashing trick: token features hash into a FIXED number
  * of buckets, so the per-bucket model table is constant-size and
  * broadcastable however large the corpus — the scale contrast to
  * tfidf/surprisal, whose vocabulary tables must hash-partition. Token
  * hashes are md5-derived (reproducible in any engine with md5 — the
  * minhash family's discipline) rather than a JVM-private hash.
  */
object Selection {

  /** 32-bit md5-prefix hash of a token, as an exact long in [0, 2³²). */
  private def tokHash(w: Column): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long")

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3: score
    * every document with an LM, split the corpus at the per-language
    * perplexity TERCILES into head/middle/tail, keep head+middle): takes
    * any per-doc score frame (here: unigram surprisal as the self-
    * contained LM), computes per-`groupCol` tercile boundaries, and
    * labels each document by comparison.
    *
    * Scale shape: exact sort-based `percentile` per group — one shuffle
    * of (group, score) pairs; the boundary table is vocabulary-sized and
    * joins back BROADCAST; labeling is a narrow comparison pass. The
    * boundaries round to 4 dp before comparison (events_rfm's parity
    * discipline: both engines then compare identical doubles; a doc
    * whose score EQUALS a rounded boundary goes to the lower bucket in
    * both engines, `<=` semantics).
    *
    * @return (id, group, score, bucket) with bucket ∈ head|middle|tail
    *         (head = LOWEST surprisal = most fluent, as in CCNet)
    */
  def pplBuckets(scored: DataFrame, idCol: String, groupCol: String,
                 scoreCol: String): DataFrame = {
    val b = scored.groupBy(col(groupCol).as("g"))
      .agg(round(expr(s"percentile($scoreCol, 0.3333333333)"), 4).as("b1"),
        round(expr(s"percentile($scoreCol, 0.6666666667)"), 4).as("b2"))
    scored.join(broadcast(b), col(groupCol) === col("g"))
      .select(col(idCol), col(groupCol), col(scoreCol),
        when(col(scoreCol) <= col("b1"), "head")
          .when(col(scoreCol) <= col("b2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DSIR importance score per document: with hashed unigram features,
    * score(doc) = (1/n) Σ_w log2( p_target(h(w)) / p_raw(h(w)) ) — the
    * per-token log importance weight of the target distribution over the
    * raw distribution, add-1 smoothed over `numBuckets` buckets.
    * Documents whose token mix resembles the `isTarget` slice score > 0
    * and would be kept by importance resampling.
    *
    * Scale shape: ONE token explode feeds both distribution counts; the
    * bucket model is `numBuckets` rows — aggregated with map-side
    * combine, then BROADCAST back for per-token lookup (the hashing
    * trick's point: the model never grows with the corpus, unlike a
    * vocabulary join); per-bucket log-ratios are rounded to 4 dp and
    * ×10⁴-scaled to exact longs before the per-doc sum (order-free —
    * the surprisal discipline, same documented libm residual risk).
    *
    * @param isTarget predicate over `docs` rows marking the target-domain
    *                 sample (e.g. `col("lang") === "en"`)
    * @return (doc_id, n_words, dsir_score, keep)
    */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
                isTarget: Column, numBuckets: Int = 64): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"), isTarget.as("tgt"),
      explode(split(normText(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"), col("tgt"),
        (tokHash(col("w")) % numBuckets).as("b"))
    // one pass over the tokens builds both distributions: conditional
    // counts per bucket (map-side combined; ≤ numBuckets result rows)
    val model = words.groupBy("b").agg(
      count(lit(1)).as("r_cnt"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("t_cnt"))
    val totals = broadcast(model.agg(
      sum("r_cnt").as("r_tot"), sum("t_cnt").as("t_tot")))
    val lr4 = round(log2(
      ((col("t_cnt") + 1).cast("double") / (col("t_tot") + numBuckets)) /
        ((col("r_cnt") + 1).cast("double") / (col("r_tot") + numBuckets)))
      * 10000).cast("long")
    val lut = broadcast(model.crossJoin(totals)
      .select(col("b"), lr4.as("lr4")))
    words.join(lut, "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("lr4").as("s4"))
      .select(col("doc_id"), col("n_words"),
        // UNROUNDED since r7 (the text_surprisal sf0.1 tie, same shape:
        // s4/10⁴/n landed on -0.00015 → -0.0002 vs -0.0001)
        (col("s4") / 10000.0 / col("n_words")).as("dsir_score"))
      .withColumn("keep", col("dsir_score") > 0)
  }

  /** fastText-style linear text classifier over hashed bag-of-words
    * features: score(doc) = (1/n) Σ_w weight(h(w)), with the weight
    * table derived deterministically from the feature hash
    * (weight ∈ [−1, 1] in exact 1/1000 steps). The weights stand in for
    * trained coefficients — the PLUMBING (hashed features, linear
    * scoring, threshold gate) is the production shape; swapping in a
    * trained weight array changes one expression.
    *
    * Scale shape: ZERO shuffle — the whole score is a higher-order
    * `aggregate` fold over the token array inside one projection
    * (exact integer accumulator, so no float-order concerns at all:
    * this operator has NO libm residual risk, unlike dsir/surprisal).
    *
    * @return (doc_id, n_tokens, clf_score, keep)
    */
  def hashedLinearScore(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val weightSum =
      "aggregate(toks, 0L, (acc, x) -> acc + " +
        "(CAST(conv(substring(md5(x), 1, 8), 16, 10) AS BIGINT) % 2001 - 1000))"
    docs.select(col(idCol).as("doc_id"),
      filter(split(normText(col(textCol)), " "),
        w => length(w) > 0).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        expr(weightSum).as("wsum"))
      .filter(col("n_tokens") > 0)
      // deliberately NOT rounded: wsum and n_tokens are exact integers
      // and one IEEE division is bit-identical in any engine — while a
      // 4 dp round can LAND on a .00005 tie (wsum/(1000n) is a finite
      // decimal whenever n divides a power of 10), where Spark's
      // BigDecimal HALF_UP and a binary-value round disagree (seen live:
      // wsum=-2946, n=40 → -0.07365 → -0.0737 vs -0.0736)
      .select(col("doc_id"), col("n_tokens"),
        (col("wsum") / (col("n_tokens") * 1000.0)).as("clf_score"))
      .withColumn("keep", col("clf_score") > 0)
  }

  /** Greedy token-budget selection: take documents in (score desc, id)
    * order until a token budget is exhausted — the "best N tokens"
    * corpus-construction step that follows any quality scorer (the
    * selection half of the quality-filter pipelines; DSIR §2's top-k
    * resampling is the same shape with importance weights).
    *
    * The global prefix sum is the scale problem: a naive
    * `SUM() OVER (ORDER BY score)` funnels the whole corpus through
    * ONE window partition. This runs the classic two-phase distributed
    * scan instead:
    *  1. coarse score bins (score4 div binWidth — monotone in score, so
    *     bin order refines to the global order); per-bin token totals
    *     are a BOUNDED frame (score range / binWidth rows);
    *  2. exclusive bin-offset cumsum over that bounded frame (the ONE
    *     small unpartitioned window, vocab_growth's whitelist class),
    *     broadcast back;
    *  3. (r14, VERDICT r13 item 6 — the skew level) exclusive
    *     per-exact-score offsets WITHIN each bin: the sub-frame has at
    *     most binWidth rows per bin BY CONSTRUCTION (bin = score4 div
    *     binWidth), so a score distribution concentrated in one bin —
    *     the quantile-shaped worst case the r13 watch item named —
    *     costs a ≤ binWidth-row window, never a corpus-sized one;
    *  4. per-doc running sum WITHIN each (bin, score4) partition + both
    *     offsets = exact global prefix, each doc in parallel. The
    *     residual skew key is EXACT 4-dp score ties (docs sharing one
    *     score4 value land in one ordered partition — unavoidable for
    *     an exact prefix, since the within-tie order is doc_id itself);
    *     mean-token-length scores spread ties by construction.
    *
    * Budget is a FRACTION of the corpus' total tokens (computed in the
    * same pass, integer-exact `4·total div 10` for 40%), so the query
    * scales with the data instead of hard-coding an absolute budget.
    *
    * @return one row per selected doc: (doc_id, src, score4, n_tokens,
    *         cum_tokens); callers aggregate
    */
  def budgetSelect(docs: DataFrame, idCol: String, textCol: String,
                   srcCol: String, budgetNum: Int = 4,
                   budgetDen: Int = 10, binWidth: Long = 1024L): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(srcCol).as("src"),
      filter(split(normText(col(textCol)), " "),
        w => length(w) > 0).as("toks"))
      .select(col("doc_id"), col("src"),
        size(col("toks")).cast("long").as("n_tokens"),
        // score: mean token length ×10⁴, integer-exact (round of an
        // exact-int ratio; the 4 dp round CAN land on a half tie only
        // when n divides 2·10⁴ — acceptable for a selection ORDER, and
        // the oracle rounds the identical ratio)
        expr("CAST(round(10000.0 * aggregate(toks, 0L, (acc, x) -> " +
          "acc + length(x)) / size(toks)) AS BIGINT)").as("score4"))
      .filter(col("n_tokens") > 0)
    val binned = base.withColumn("bin",
      floor(col("score4") / binWidth).cast("long"))
    // bounded frame: one row per occupied bin
    val binTot = binned.groupBy("bin")
      .agg(sum("n_tokens").as("bin_tokens"))
    val wBins = Window.orderBy(col("bin").desc)
    val offsets = binTot.withColumn("bin_offset",
      coalesce(sum("bin_tokens").over(
        wBins.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bin", "bin_offset")
    val total = base.agg(sum("n_tokens").as("total_tokens"))
    // level 2: one row per exact score value — ≤ binWidth rows per bin
    // by construction, so this window is skew-proof against any score
    // distribution; sub_offset = tokens of strictly-higher scores in
    // the same bin
    val scoreTot = binned.groupBy("bin", "score4")
      .agg(sum("n_tokens").as("score_tokens"))
    val wScores = Window.partitionBy("bin").orderBy(col("score4").desc)
    val subOffsets = scoreTot.withColumn("sub_offset",
      coalesce(sum("score_tokens").over(
        wScores.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bin", "score4", "sub_offset")
    val wIn = Window.partitionBy("bin", "score4").orderBy(col("doc_id"))
    binned
      .join(broadcast(offsets), "bin")
      .join(broadcast(subOffsets), Seq("bin", "score4"))
      .withColumn("cum_tokens", col("bin_offset") + col("sub_offset") +
        sum("n_tokens").over(
          wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      // integer-exact budget: DIV keeps the threshold a bigint in both
      // engines (Column `/` would be a double division)
      .filter(col("cum_tokens") <=
        expr(s"total_tokens * $budgetNum DIV $budgetDen"))
      .select("doc_id", "src", "score4", "n_tokens", "cum_tokens")
  }
}
