package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, EventOps, Intervals, Similarity,
  TextAnalysis}

/** Specs for the round-8 additions: interval merge, weighted reservoir
  * sampling, Kneser–Ney bigram surprisal, duplicated-substring
  * coverage, embedding-dim covariance, CUSUM change-point track. Each
  * operator is checked against an independent in-test derivation (the
  * brute-force-twin convention), not against itself. */
class RoundEightOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("mergeIntervals: overlap, containment, adjacency, gap, per-key") {
    // chr 0: [10,19]+[15,24] overlap; [25,30] is ADJACENT to 24 (fuses);
    // [40,45] after a real gap. chr 1: [5,8] contained in [3,10].
    val iv = Seq((0L, 10L, 19L), (0L, 15L, 24L), (0L, 25L, 30L),
      (0L, 40L, 45L), (1L, 3L, 10L), (1L, 5L, 8L)).toDF("chr", "s", "e")
    val got = Intervals.mergeIntervals(iv, Seq("chr"), col("s"), col("e"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 10L, 30L, 3L, 21L),
      (0L, 40L, 45L, 1L, 6L),
      (1L, 3L, 10L, 2L, 8L)))
    // blocks within a key are disjoint AND non-adjacent by construction
    val blocks = got.toSeq.sortBy(b => (b._1, b._2))
    blocks.sliding(2).foreach {
      case Seq((c1, _, e1, _, _), (c2, s2, _, _, _)) if c1 == c2 =>
        assert(s2 > e1 + 1, s"blocks [$e1]·[$s2] should have fused")
      case _ =>
    }
  }

  test("weightedReservoir equals the brute-force A-ES selection") {
    val docs = (1L to 200L).map(id => (id, (id % 7 + 1) * 10L))
      .toDF("doc_id", "wt")
    val got = Curation.weightedReservoir(docs, "doc_id", col("wt"), k = 10)
      .as[(Long, Long, Long, Long)].collect().toList
    // independent derivation: same md5-uniform, same scaled-long key
    val expected = (1L to 200L).map { id =>
      val w = (id % 7 + 1) * 10L
      val u = (java.lang.Long.parseLong(md5hex(id.toString).take(6), 16)
        .toDouble + 0.5) / 16777216.0
      val key6 = math.round(-math.log(u) / w * 1e6)
      (key6, id, w)
    }.sortBy(t => (t._1, t._2)).take(10).zipWithIndex
      .map { case ((key6, id, w), i) => (i + 1L, id, w, key6) }.toList
    assert(got == expected)
    // heavier items must dominate the sample: two weight classes,
    // heavy 100x — with u ~ U(0,1), −ln(u)/w concentrates near 0 for
    // large w, so the top-k is nearly all heavy class
    val two = (1L to 2000L).map(id =>
      (id, if (id % 2 == 0) 1000L else 10L)).toDF("doc_id", "wt")
    val heavy = Curation.weightedReservoir(two, "doc_id", col("wt"), 100)
      .filter(col("w") === 1000L).count()
    assert(heavy > 80, s"heavy class got only $heavy of 100 slots")
  }

  test("knBigramSurprisal matches the hand-evaluated KN formula") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knBigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // bigram types: (a b) c12=3, (b a) 1, (b c) 2, (c d) 1  → NT=4
    // c1: a→3, b→3, c→1;  N1+(w1·): a→1, b→2, c→1
    // N1+(·w2): b→1, a→1, c→1, d→1
    val nt = 4.0
    def p(c12: Long, c1: Long, n1f: Long, n1b: Long): Double =
      math.max(c12 - 0.75, 0.0) / c1 + 0.75 * n1f / c1 * (n1b / nt)
    def su4(p0: Double): Long = math.round(-math.log(p0) / math.log(2.0) * 10000)
    val suAB = su4(p(3, 3, 1, 1)); val suBA = su4(p(1, 3, 2, 1))
    val suBC = su4(p(2, 3, 2, 1)); val suCD = su4(p(1, 1, 1, 1))
    // doc 1 bigrams: ab, ba, ab, bc ; doc 2: ab, bc, cd
    val exp1 = (suAB + suBA + suAB + suBC) / 10000.0 / 4
    val exp2 = (suAB + suBC + suCD) / 10000.0 / 3
    assert(got(1L) == ((4L, exp1)))
    assert(got(2L) == ((3L, exp2)))
  }

  test("substrDupCoverage: shared prefix found, unique doc untouched") {
    // docs 1 and 2 share an identical 100-char prefix (normalized
    // form), then diverge; doc 3 is unique; doc 4 too short for a gram
    val prefix = ("the quick brown fox jumps over the lazy dog again and " +
      "again until the fence falls over at dawn today").take(100)
    assert(prefix.length == 100)
    val docs = Seq(
      (1L, prefix + " first continuation with its own distinct tail here"),
      (2L, prefix + " second continuation that differs from the first one"),
      (3L, "entirely unique text with no repeated runs anywhere in the " +
        "corpus long enough to clear the gram width threshold"),
      (4L, "too short")).toDF("doc_id", "text")
    val got = Dedup.substrDupCoverage(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // brute-force twin: stride-25 50-char grams over the same strings
    val texts = Map(1L -> (prefix + " first continuation with its own " +
      "distinct tail here"), 2L -> (prefix + " second continuation that " +
      "differs from the first one"), 3L -> ("entirely unique text with " +
      "no repeated runs anywhere in the corpus long enough to clear the " +
      "gram width threshold"))
    val grams = texts.toSeq.flatMap { case (id, t) =>
      (0 to t.length - 50 by 25).map(i => (id, t.substring(i, i + 50))) }
    val df = grams.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size)
    texts.keys.foreach { id =>
      val mine = grams.filter(_._1 == id)
      val nDup = mine.count(g => df(g._2) >= 2)
      assert(got(id) == ((mine.size.toLong, nDup.toLong,
        nDup.toDouble / mine.size)), s"doc $id")
    }
    assert(!got.contains(4L))
    assert(got(1L)._2 >= 3 && got(3L)._2 == 0)
  }

  test("dimCovariance matches the exact scaled-moment formula") {
    val vecs = Seq(
      (1L, Array(1.0f, 2.0f, -1.5f, 9f)),
      (2L, Array(0.5f, -1.0f, 2.25f, 9f)),
      (3L, Array(-2.0f, 0.25f, 1.0f, 9f))).toDF("vec_id", "embedding")
    val got = Similarity.dimCovariance(vecs, "embedding", dims = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size == 6) // upper triangle of 3x3
    val raw = Seq(Array(1.0f, 2.0f, -1.5f), Array(0.5f, -1.0f, 2.25f),
      Array(-2.0f, 0.25f, 1.0f))
    for (i <- 0 until 3; j <- i until 3) {
      val xs = raw.map(v => math.round(v(i).toDouble * 1000000))
      val ys = raw.map(v => math.round(v(j).toDouble * 1000000))
      val n = raw.size.toLong
      val sij = xs.zip(ys).map { case (a, b) => a * b }.sum
      val cov = sij.toDouble / n / 1e12 -
        (xs.sum.toDouble / n / 1e6) * (ys.sum.toDouble / n / 1e6)
      assert(got((i.toLong, j.toLong)) == ((n, cov)), s"dims ($i,$j)")
    }
  }

  test("cusumTrack: sustained shift alarms, flat series excluded, S>=0") {
    val dayUs = 86400000000L
    // type "a": 20 noisy-baseline days then a sustained +shift the
    // per-day z-test would never flag; type "b": perfectly flat (std 0)
    def dayCounts(day: Int): Int =
      if (day < 20) 10 + (day % 3) else 15 + (day % 3)
    val rows = (0 until 30).flatMap { d =>
      (0 until dayCounts(d)).map(i => ("a", d * dayUs + i * 1000L)) } ++
      (0 until 30).flatMap { d =>
        (0 until 8).map(i => ("b", d * dayUs + i * 1000L)) }
    val events = rows.toDF("event_type", "ts_us")
    val track = EventOps.cusumTrack(events, "event_type", col("ts_us"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(track.forall(_._1 == "a"), "flat type must be excluded")
    assert(track.length == 30)
    assert(track.forall(_._5 >= 0L), "CUSUM statistic is nonnegative")
    // the prefix identity re-derived from the collected c4 column
    val byDay = track.sortBy(_._2)
    var runMin = 0L
    byDay.foreach { r =>
      runMin = math.min(runMin, r._4)
      assert(r._5 == r._4 - runMin, s"day ${r._2}: S != C - min prefix")
    }
    // no alarm in the baseline window; alarm latched by the shift tail
    assert(byDay.takeWhile(_._2 < 20).forall(_._6 == 0L))
    assert(byDay.exists(r => r._2 >= 20 && r._6 == 1L),
      "sustained shift never alarmed")
  }
}
