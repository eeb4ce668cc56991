package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Dedup.normText

/** One EM step of PLSA topic modeling (Hofmann 1999 "Probabilistic
  * Latent Semantic Analysis") from a DETERMINISTIC initialization —
  * the kmeansStep discipline applied to topic models: one graded,
  * engine-reproducible iteration instead of an ungradeable random
  * restart loop.
  *
  * Initialization (both engines derive it bit-for-bit):
  *  - p(z|d) ∝ 1 + ((d + z) mod K): the residues cycle over 1..K, so
  *    the per-doc normalizer is the CONSTANT K(K+1)/2 — exact decimal
  *    probabilities, no per-doc agg;
  *  - p(w|z) ∝ 1 + (md5₃₂(w:z) mod 1000): md5-derived pseudo-random
  *    weights (the minhash reproducibility discipline), normalized by
  *    a per-topic vocabulary sum (K broadcast rows — the only
  *    model-side aggregate).
  *
  * E-step: responsibilities r(z|d,w) ∝ p(w|z)·p(z|d), the K-term
  * denominator summed in FIXED z order (an explicit 4-term literal sum,
  * not an aggregate — per-row arithmetic, no float accumulation).
  * M-step: nw(w,z) = Σ_d n(d,w)·r(z|d,w) with r ×10⁶-rounded to an
  * exact long FIRST (surprisal discipline), so the doc-sum is
  * order-free integer addition.
  *
  * Scale shape: one (doc, word) count shuffle, one vocabulary-keyed
  * join onto the p(w|z) weight table (co-partitioned on the word key —
  * a 100 TB vocabulary must NEVER broadcast; the K-row normalizers DO
  * broadcast), narrow K-way per-row explode, one partial-agg shuffle
  * onto the (word, topic) frame, and a per-topic top-N window over
  * that vocabulary-sized result.
  *
  * @return (z, rank, w, nw6) — top `topN` words per topic by new
  *         unnormalized weight nw(w,z), ×10⁶-scaled exact long
  */
object Topics {

  /** 32-bit md5-prefix weight 1 + (h mod 1000) for (word, topic). */
  private def wzWeight(w: Column, z: Int): Column =
    lit(1L) + pmod(conv(substring(md5(concat(w, lit(":" + z))), 1, 8),
      16, 10).cast("long"), lit(1000L))

  def plsaStep(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 4, topN: Int = 10): DataFrame = {
    require(k >= 2 && k <= 8, s"k in [2,8], got $k")
    val words = docs.select(col(idCol).cast("long").as("d"),
        explode(split(normText(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val dw = words.groupBy("d", "w").agg(count(lit(1)).as("n"))

    // per-topic weight columns + the vocabulary normalizers (K rows)
    val vocab = dw.select("w").distinct()
      .select(col("w") +: (0 until k).map(z =>
        wzWeight(col("w"), z).as(s"wt$z")): _*)
    val bz = broadcast(vocab.agg(
      sum(s"wt0").as(s"bz0"),
      (1 until k).map(z => sum(s"wt$z").as(s"bz$z")): _*))

    val joined = dw.join(vocab, "w").crossJoin(bz)
    // p(z|d) = (1 + (d+z) mod K) / (K(K+1)/2): exact decimals
    val dz = k * (k + 1) / 2
    def pzd(z: Int): Column =
      (lit(1.0) + pmod(col("d") + z, lit(k.toLong))) / dz
    // num_z = p(w|z)·p(z|d); denominator in fixed z order
    def num(z: Int): Column =
      (col(s"wt$z").cast("double") / col(s"bz$z")) * pzd(z)
    val denom = (1 until k).map(num).foldLeft(num(0))(_ + _)
    val resp = joined.select(
      col("w") +: col("n") +: (0 until k).map(z =>
        round(num(z) / denom * 1000000).cast("long").as(s"r$z")): _*)

    // M-step: exact-long doc sums onto the (w, z) frame
    val zRows = resp.select(col("w"), col("n"),
      explode(array((0 until k).map(z =>
        struct(lit(z).as("z"), col(s"r$z").as("r6"))): _*)).as("p"))
      .select(col("w"), col("p.z").as("z"),
        (col("n") * col("p.r6")).as("nw6"))
    val nw = zRows.groupBy("z", "w").agg(sum("nw6").as("nw6"))
    val win = org.apache.spark.sql.expressions.Window.partitionBy("z")
      .orderBy(col("nw6").desc, col("w"))
    nw.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= topN)
      .select(col("z").cast("long").as("z"),
        col("rank").cast("long").as("rank"), col("w"), col("nw6"))
  }
}
