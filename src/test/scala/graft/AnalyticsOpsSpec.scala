package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dna
import graft.operators.{Intervals, Selection, Similarity, TextAnalysis}

/** Specs for the round-7 analytics additions: interval coverage sweep,
  * full-corpus k-means step, perplexity bucketing, vocabulary growth,
  * k-mer expansion. */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coverageSegments: overlap, gap, adjacency, per-key isolation") {
    // chr 0: [10,19] and [15,24] overlap on [15,19]; [30,34] after a gap
    // chr 1: [10,19] alone — keys sweep independently
    val iv = Seq((0L, 10L, 19L), (0L, 15L, 24L), (0L, 30L, 34L),
      (1L, 10L, 19L)).toDF("chr", "s", "e")
    val segs = Intervals.coverageSegments(iv, Seq("chr"), col("s"), col("e"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(segs == Set(
      (0L, 10L, 15L, 1L, 5L), (0L, 15L, 20L, 2L, 5L), (0L, 20L, 25L, 1L, 5L),
      (0L, 25L, 30L, 0L, 5L), // the inter-interval gap is a depth-0 segment
      (0L, 30L, 35L, 1L, 5L),
      (1L, 10L, 20L, 1L, 10L)))
    val hist = Intervals.coverageHistogram(iv, Seq("chr"), col("s"), col("e"))
      .as[(Long, Long, Long)].collect().toSet
    assert(hist == Set((0L, 1L, 5L), (1L, 4L, 25L), (2L, 1L, 5L)))
    // two intervals meeting exactly (stop+1 == start) cancel their
    // breakpoint: one merged-depth segment, no zero-length artifact
    val adj = Seq((0L, 1L, 5L), (0L, 6L, 9L)).toDF("chr", "s", "e")
    val a = Intervals.coverageSegments(adj, Seq("chr"), col("s"), col("e"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == Set((0L, 1L, 10L, 1L, 9L)))
  }

  test("kmeansStep: exact per-cluster per-dim means against hand assignment") {
    // 2 centroids in 2-d: c0=(0,0), c1=(10,10); points split by geometry
    val cents = Array(Array(0f, 0f), Array(10f, 10f))
    val vecs = Seq(
      (1L, Array(1f, 2f)), (2L, Array(2f, 1f)),     // -> c0
      (3L, Array(9f, 9f)), (4L, Array(11f, 10f))    // -> c1
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansStep(vecs, "embedding", cents)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      (0L, 0L) -> ((2L, 1.5)), (0L, 1L) -> ((2L, 1.5)),
      (1L, 0L) -> ((2L, 10.0)), (1L, 1L) -> ((2L, 9.5))))
  }

  test("pplBuckets: tercile labels per group, boundary goes low") {
    val scored = (1 to 9).map(i => (i.toLong, "en", i.toDouble))
      .toDF("id", "lang", "score")
    val out = Selection.pplBuckets(scored, "id", "lang", "score")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    // percentile(1..9, 1/3)≈3.6667, (2/3)≈6.3333: 1-3 head, 4-6 middle
    assert((1L to 3L).forall(out(_) == "head"))
    assert((4L to 6L).forall(out(_) == "middle"))
    assert((7L to 9L).forall(out(_) == "tail"))
    // a score exactly on a rounded boundary labels LOW (<= semantics)
    val tie = Seq((1L, "x", 1.0), (2L, "x", 2.0), (3L, "x", 3.0))
      .toDF("id", "lang", "score")
    val t = Selection.pplBuckets(tie, "id", "lang", "score")
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(t == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }

  test("vocabGrowth bins tokens by first-occurrence checkpoint") {
    // doc 0 introduces a b; doc 1 re-uses a, introduces c; doc 25 only
    // re-uses; doc 30 introduces d (second checkpoint at step=25)
    val docs = Seq((0L, Seq("a", "b")), (1L, Seq("a", "c")),
      (25L, Seq("b", "c")), (30L, Seq("d"))).toDF("doc_id", "toks")
    val out = TextAnalysis.vocabGrowth(docs, "doc_id", col("toks"), 25L)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(out == List((25L, 3L, 3L), (50L, 1L, 4L)))
  }

  test("bpePairCounts: corpus-weighted pair counts with total-order ranks") {
    // "ab ab abc d": pair 'ab' from ab(x2, freq-weighted) + abc(x1) = 3;
    // 'bc' = 1; 1-char word d contributes nothing
    val docs = Seq("ab ab abc", "d ab").toDF("text")
    val out = TextAnalysis.bpePairCounts(docs, "text", topK = 10)
      .as[(Long, String, Long)].collect().toList.sortBy(_._1)
    assert(out == List((1L, "ab", 4L), (2L, "bc", 1L)))
    // topK truncates on the (cnt desc, pair asc) total order
    val top1 = TextAnalysis.bpePairCounts(docs, "text", topK = 1)
      .as[(Long, String, Long)].collect().toList
    assert(top1 == List((1L, "ab", 4L)))
  }

  test("wordBigrams + Dna.kmers expansion and short-input guards") {
    val bg = Seq("one two  three", "solo", "").toDF("t")
      .select(TextAnalysis.wordBigrams(col("t")).as("b"))
      .as[Seq[String]].collect().toList
    assert(bg == List(Seq("one two", "two three"), Seq(), Seq()))
    val km = Seq("ACGTA", "ACG", "AC").toDF("dna")
      .select(Dna.kmers(col("dna"), 3).as("k"))
      .as[Seq[String]].collect().toList
    // multiplicity preserved, shorter-than-k input yields empty
    assert(km == List(Seq("ACG", "CGT", "GTA"), Seq("ACG"), Seq()))
  }
}
