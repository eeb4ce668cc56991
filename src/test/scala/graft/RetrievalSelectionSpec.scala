package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Cohorts, Retrieval, Selection}

class RetrievalSelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // scalar twin of the operators' md5-prefix token hash, computed here
  // with MessageDigest directly so the spec checks the plan wiring
  // against an independent derivation
  private def tokHash(w: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  test("bm25: hand-derived scores, non-matching docs absent, tf ordering") {
    val docs = Seq(
      (1L, "spark window spark"), // dl=3, tf(spark)=2, tf(window)=1
      (2L, "merge table"),        // dl=2, tf(merge)=1
      (3L, "a b c d")             // no query term -> absent
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(1L, 2L))
    // independent scalar derivation: N=3, avgdl=3.0, every df=1
    val idf = BigDecimal(math.log((3 - 1 + 0.5) / 1.5 + 1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def contrib(tf: Long, dl: Long): Long =
      math.round(idf * ((tf * 2.2) /
        (tf + 1.2 * (0.25 + 0.75 * (dl / 3.0)))) * 10000)
    val d1 = (contrib(2, 3) + contrib(1, 3)) / 10000.0
    val d2 = contrib(1, 2) / 10000.0
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 2 && byId(2L)._2 == 1)
    assert(math.abs(byId(1L)._3 - BigDecimal(d1).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(byId(2L)._3 - BigDecimal(d2).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // two hits of the rarer-weighted doc outrank the single hit
    assert(out.head._1 == 1L)
  }

  test("pmi collocations: multiplicity-preserving bigrams, minCount cut") {
    // "a b" x5 adjacent, plus filler so independence baseline is busy
    val docs = Seq(
      (1L, "a b a b a b"),       // bigrams: ab,ba,ab,ba,ab
      (2L, "a b a b x y z w v")  // ab,ba,ab + filler
    ).toDF("doc_id", "text")
    val out = Retrieval.pmiCollocations(docs, "doc_id", "text",
      minCount = 5, topK = 10).collect()
    // only ("a","b") reaches 5 occurrences (ba has 4)
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    val (nAb, nA, nB) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nAb == 5 && nA == 5 && nB == 5)
    // totals: 15 unigrams, 13 bigrams; pmi re-derived independently
    val exp = BigDecimal(math.log((5.0 / 13) / ((5.0 / 15) * (5.0 / 15)))
      / math.log(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(5) - exp) < 1e-9)
  }

  test("dsir: target-like docs score positive, off-target negative") {
    val docs = (
      (1 to 8).map(i => (i.toLong, "alpha beta gamma delta", "en")) ++
      (9 to 16).map(i => (i.toLong, "omega sigma tau rho", "de")) :+
      ((17L, "alpha beta omega sigma", "de"))).toDF("doc_id", "text", "lang")
    val out = Selection.dsirScore(docs, "doc_id", "text",
      col("lang") === "en", numBuckets = 64)
    val byId = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(byId.size == 17)
    // pure-target vocabulary docs: every token's bucket is target-heavy
    assert(byId(1L)._2 > 0 && byId(1L)._3)
    // pure-raw vocabulary docs score negative (tokens absent from target)
    assert(byId(9L)._2 < 0 && !byId(9L)._3)
    // the 50/50 mix sits between the two pure scores
    assert(byId(17L)._2 > byId(9L)._2 && byId(17L)._2 < byId(1L)._2)
    assert(byId(1L)._1 == 4)
  }

  test("hashed linear classifier: exact scalar twin, zero-shuffle plan") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "lorem ipsum"))
      .toDF("doc_id", "text")
    val out = Selection.hashedLinearScore(docs, "doc_id", "text")
    // zero shuffle: the whole score is one projection over the scan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "classifier plan must not shuffle")
    val byId = out.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def expected(ws: Seq[String]): Double =
      ws.map(w => tokHash(w) % 2001 - 1000).sum / (ws.size * 1000.0)
    assert(byId(1L)._1 == 4)
    assert(byId(1L)._2 == expected(Seq("the", "quick", "brown", "fox")))
    assert(byId(2L)._2 == expected(Seq("lorem", "ipsum")))
  }

  private val WeekUs = 604800000000L

  test("retention: cohorts by first week, offsets, shares") {
    val ev = Seq(
      (1L, 0L * WeekUs + 5L), (1L, 1L * WeekUs + 9L), (1L, 3L * WeekUs),
      (2L, 0L * WeekUs + 1L),
      (3L, 1L * WeekUs + 2L), (3L, 2L * WeekUs + 2L)
    ).toDF("user_id", "ts_us")
    val out = Cohorts.retentionMatrix(ev, "user_id", col("ts_us"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      (0L, 0L) -> (2L, 1.0), (0L, 1L) -> (1L, 0.5), (0L, 3L) -> (1L, 0.5),
      (1L, 0L) -> (1L, 1.0), (1L, 1L) -> (1L, 1.0)))
  }

  test("rfm: five users with strictly increasing metrics span scores 1-5") {
    val dayUs = 86400000000L
    // user k: last active day k, k events, value 10*k each
    val ev = (1 to 5).flatMap { k =>
      (1 to k).map(i => (k.toLong, k * dayUs + i, 10.0 * k))
    }.toDF("user_id", "ts_us", "value")
    val out = Cohorts.rfmSegments(ev, "user_id", col("ts_us"), col("value"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.map(_._4).sum == 5)
    // metrics are strictly monotone in k, so r=f=m per user and the five
    // users land exactly on scores 1..5
    assert(out.toSet == (1 to 5).map(k => (k, k, k, 1L)).toSet)
  }
}
