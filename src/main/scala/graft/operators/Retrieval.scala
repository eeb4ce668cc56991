package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Dedup.normText

/** Corpus retrieval / mining primitives: BM25 ranked retrieval and PMI
  * collocation mining. Both are standard published formulations
  * (Robertson & Walker 1994 Okapi BM25 with the Lucene non-negative idf;
  * Church & Hanks 1990 pointwise mutual information) expressed as
  * declarative plans.
  *
  * Cross-engine determinism discipline (the tfidf/surprisal pattern):
  * every libm-dependent value (`ln`, `log2`) is rounded to 4 dp the
  * moment it is computed, per-document contributions are scaled to exact
  * integers (×10⁴) before any aggregation so float summation order can
  * never shift a result, and all remaining arithmetic is IEEE-exact
  * (+ − × ÷ are correctly rounded, so identical inputs give bit-identical
  * doubles in any engine).
  */
object Retrieval {

  /** BM25 top-k retrieval of `docs` against a fixed bag of query terms.
    *
    * Scale shape: per-document length `dl` is NARROW work
    * (`size(split(...))` — no shuffle, no second pass); tokens are
    * filtered to the query terms BEFORE the (doc, term) tf aggregation,
    * so only rows for documents containing a query term ever shuffle;
    * the per-term df/idf frame is at most |queryTerms| rows and
    * broadcast; corpus totals (N, avgdl) ride in as a broadcast 1-row
    * frame; the final top-k is a global sort LIMIT
    * (TakeOrderedAndProject — per-partition heaps, no single-partition
    * window). Nothing in the plan grows with corpus size except the
    * one partial-aggregated tf shuffle of matching (doc, term) rows.
    *
    * Determinism: idf = round(ln((N − df + 0.5)/(df + 0.5) + 1), 4)
    * (the Lucene BM25 variant — always ≥ 0); each term's contribution
    * is rounded to 4 dp and ×10⁴-scaled to a long before the per-doc
    * sum; ties in the final order break on doc_id.
    *
    * @return (doc_id, n_hit, score) — top `k` by score desc
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      normText(col(textCol)).as("t"))
      .withColumn("dl", size(split(col("t"), " ")))
    val words = base.select(col("doc_id"), col("dl"),
      explode(split(col("t"), " ")).as("w"))
      .filter(col("w").isin(queryTerms: _*))
    val tf = words.groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf"))
    // (doc_id, w) is unique in tf, so count(*) per term IS the doc freq
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val stats = broadcast(base.agg(count(lit(1)).as("n_docs"),
      round(sum(col("dl")).cast("double") / count(lit(1)), 4).as("avgdl")))
    val idf = round(
      log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 4)
    val contrib = round(
      col("idf") * ((col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
        * 10000)
      .cast("long")
    tf.join(broadcast(df.crossJoin(stats).select(col("w"), idf.as("idf"))), "w")
      .crossJoin(stats)
      .select(col("doc_id"), contrib.as("c4"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit"),
        round(sum(col("c4")) / 10000.0, 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** PMI bigram collocation mining: adjacent-word pairs whose observed
    * corpus frequency beats the independence assumption,
    * pmi = log2( p(ab) / (p(a)·p(b)) ), reported for pairs seen at least
    * `minCount` times, top `topK` by (pmi desc, words asc).
    *
    * Scale shape: bigrams are NARROW per-row work — a
    * `transform(sequence(...))` over the token array preserves
    * multiplicity with no join and no window ([[Curation.wordGrams]] is
    * the distinct-gram twin for decontamination; collocation counting
    * needs every occurrence); bigram and unigram counts are partial-agg
    * shuffles on the gram/word key; the two count lookups are equi-joins
    * on the word key (a 100 TB corpus's vocabulary is NOT broadcastable —
    * same honest shape as tfidf); corpus totals ride in as a broadcast
    * 1-row frame; `minCount` prunes the candidate frame BEFORE the joins;
    * final top-k is a global sort LIMIT.
    *
    * @return (w_a, w_b, n_ab, n_a, n_b, pmi)
    */
  def pmiCollocations(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Int = 5, topK: Int = 50): DataFrame = {
    val arrs = docs.select(split(normText(col(textCol)), " ").as("ws"))
    val bigrams = arrs.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), " +
          "i -> struct(element_at(ws, i + 1) AS wa, element_at(ws, i + 2) AS wb))"))
        .as("p"))
      .select(col("p.wa"), col("p.wb"))
    val unigrams = arrs.select(explode(col("ws")).as("w"))
      .filter(length(col("w")) > 0)
    val uc = unigrams.groupBy("w").agg(count(lit(1)).as("n"))
    val bc = bigrams.groupBy("wa", "wb").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    val totals = broadcast(
      unigrams.agg(count(lit(1)).as("t_u")).crossJoin(
        bigrams.agg(count(lit(1)).as("t_b"))))
    val pmi = round(log2(
      (col("n_ab").cast("double") / col("t_b")) /
        ((col("n_a").cast("double") / col("t_u")) *
          (col("n_b").cast("double") / col("t_u")))), 4)
    val ucA = uc.select(col("w").as("wa"), col("n").as("n_a"))
    val ucB = uc.select(col("w").as("wb"), col("n").as("n_b"))
    bc.join(ucA, "wa").join(ucB, "wb")
      .crossJoin(totals)
      .select(col("wa").as("w_a"), col("wb").as("w_b"),
        col("n_ab"), col("n_a"), col("n_b"), pmi.as("pmi"))
      .orderBy(col("pmi").desc, col("w_a").asc, col("w_b").asc)
      .limit(topK)
  }
}
