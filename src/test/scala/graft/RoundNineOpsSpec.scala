package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BloomJoin, EventOps, Graphs, TextAnalysis}

/** Specs for the round-9 additions: Bloom join prefilter, triangle
  * census, per-day entropy, day-of-week profile, A/B z-test, χ² term
  * selection. Brute-force-twin convention: every operator is checked
  * against an independent in-test derivation, and the two crash classes
  * the round-9 verdict flagged (degenerate A/B pools, degenerate χ²
  * classes) get explicit cases.
  */
class RoundNineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---- graph_triangles ----

  test("triangles: hand graph (K4 + pendant) and brute-force twin") {
    // K4 on {1,2,3,4} = 4 triangles; pendant 5-1 adds none
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (5L, 1L)).toDF("a", "b")
    val r = Graphs.triangles(k4, "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(r == ((5L, 7L, 4L)))

    // seeded random graph, brute-force count over the edge set
    val rnd = new scala.util.Random(42)
    val es = (1 to 120).map { _ =>
      val u = rnd.nextInt(25).toLong; val v = rnd.nextInt(25).toLong
      (math.min(u, v), math.max(u, v))
    }.filter(e => e._1 != e._2).distinct
    val adj = es.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      k <- j + 1 until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if adj((a, b)) && adj((a, c)) && adj((b, c))
    } brute += 1
    val got = Graphs.triangles(es.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((nodes.size.toLong, es.size.toLong, brute)))
  }

  // ---- events_entropy ----

  test("dailyEntropy: hand distributions (uniform, single-type, skewed)") {
    val dayUs = 86400000000L
    // day 0: a,a,b,b → H = 1 bit → entropy4 = 10000
    // day 1: only a  → H = 0
    // day 2: a,a,a,b → p=.75/.25, su4 discipline term-by-term
    val ev = Seq(
      (0L * dayUs + 10L, "a"), (0L * dayUs + 20L, "a"),
      (0L * dayUs + 30L, "b"), (0L * dayUs + 40L, "b"),
      (1L * dayUs + 10L, "a"),
      (2L * dayUs + 10L, "a"), (2L * dayUs + 20L, "a"),
      (2L * dayUs + 30L, "a"), (2L * dayUs + 40L, "b")
    ).toDF("us", "event_type")
    val got = EventOps.dailyEntropy(ev, "event_type", col("us"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def t4(p: Double): Long =
      math.round(p * BigDecimal(math.log(p) / math.log(2.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble * -10000.0)
    assert(got(0L) == ((4L, 2L, 10000L)))
    assert(got(1L) == ((1L, 1L, 0L)))
    assert(got(2L) == ((4L, 2L, t4(0.75) + t4(0.25))))
  }

  // ---- events_dow_profile ----

  test("dowProfile: exact dow mapping and seasonal index") {
    val dayUs = 86400000000L
    // 1970-01-01 (day 0) was a Thursday → dow 4; day 1 Friday → dow 5
    val ev = Seq(
      (0L * dayUs + 1L, "x"), (0L * dayUs + 2L, "x"),
      (1L * dayUs + 1L, "x"),
      (1L * dayUs + 2L, "y")
    ).toDF("us", "event_type")
    val got = EventOps.dowProfile(ev, "event_type", col("us"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("x", 4L)) == ((2L, 14.0 / 3.0)))
    assert(got(("x", 5L)) == ((1L, 7.0 / 3.0)))
    assert(got(("y", 5L)) == ((1L, 7.0)))
    assert(got.size == 3)
  }

  // ---- events_ab_test ----

  private def arm(user: Long): Long =
    java.lang.Long.parseLong(md5hex(user.toString).take(6), 16) % 2

  test("abTestConversion matches the hand-evaluated two-proportion z") {
    // users 1..40; conversion pattern depends on id, mixed in both arms
    val ev = (1L to 40L).flatMap { u =>
      val base = Seq((u, "view"))
      if (u % 3 == 0) base :+ ((u, "purchase")) else base
    }.toDF("user_id", "event_type")
    val got = EventOps.abTestConversion(ev, "user_id", "event_type",
      "purchase").as[(Long, Long, Long, Long, Option[Double], Long)]
      .collect().head
    val byArm = (1L to 40L).groupBy(arm)
    val (na, nb) = (byArm(0L).size.toLong, byArm(1L).size.toLong)
    val ka = byArm(0L).count(_ % 3 == 0).toLong
    val kb = byArm(1L).count(_ % 3 == 0).toLong
    assert((got._1, got._2, got._3, got._4) == ((na, ka, nb, kb)))
    val pp = (ka + kb).toDouble / (na + nb).toDouble
    val z = (ka.toDouble / na.toDouble - kb.toDouble / nb.toDouble) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / na.toDouble + 1.0 / nb.toDouble))
    assert(math.abs(got._5.get - z) < 1e-12)
    assert(got._6 == (if (math.abs(z) > 1.96) 1L else 0L))
  }

  test("abTestConversion degenerate pools: z NULL, significant 0, no throw") {
    // every user converts → pooled p = 1 → SE = 0 (the r9 sf0.01 crash)
    val all = (1L to 30L).map(u => (u, "purchase")).toDF("u", "t")
    val r1 = EventOps.abTestConversion(all, "u", "t", "purchase")
      .as[(Long, Long, Long, Long, Option[Double], Long)].collect().head
    assert(r1._5.isEmpty && r1._6 == 0L)
    assert(r1._2 + r1._4 == r1._1 + r1._3) // k == n in both arms

    // no user converts → pooled p = 0
    val none = (1L to 30L).map(u => (u, "view")).toDF("u", "t")
    val r2 = EventOps.abTestConversion(none, "u", "t", "purchase")
      .as[(Long, Long, Long, Long, Option[Double], Long)].collect().head
    assert(r2._5.isEmpty && r2._6 == 0L && r2._2 + r2._4 == 0L)

    // one arm empty: pick users whose md5 parity is all the same arm
    val oneArm = (1L to 200L).filter(arm(_) == 0L).take(10)
      .flatMap(u => Seq((u, "view"), (u, if (u % 2 == 0) "purchase" else "view")))
      .toDF("u", "t")
    val r3 = EventOps.abTestConversion(oneArm, "u", "t", "purchase")
      .as[(Long, Long, Long, Long, Option[Double], Long)].collect().head
    assert(r3._3 == 0L && r3._5.isEmpty && r3._6 == 0L)
  }

  // ---- text_chi2_terms ----

  test("chi2Terms matches the hand contingency and orders by chi2") {
    // 4 docs, class = flag; term layout (document presence):
    //   "pos" in both positive docs only  → a=2 b=0 c=0 d=2 (max chi2)
    //   "neg" in both negative docs only  → a=0 b=2 c=2 d=0 (same chi2)
    //   "mix" in one of each              → a=1 b=1 c=1 d=1 (chi2=0)
    val docs = Seq(
      (1L, true, "pos mix common"), (2L, true, "pos common"),
      (3L, false, "neg mix common"), (4L, false, "neg common")
    ).toDF("doc_id", "flag", "text")
    val got = TextAnalysis.chi2Terms(docs, "doc_id", "text", col("flag"),
      minDf = 1L, k = 10)
      .as[(Long, String, Long, Long, Double)].collect()
    // "common" is in every doc → dropped by the df < n_docs guard
    assert(!got.exists(_._2 == "common"))
    val byTerm = got.map(r => r._2 -> r).toMap
    def chi2(a: Long, b: Long, c: Long, d: Long): Double = {
      val n = (a + b + c + d).toDouble
      val diff = a.toDouble * d.toDouble - b.toDouble * c.toDouble
      n * diff * diff / (a + b).toDouble / (c + d).toDouble /
        (a + c).toDouble / (b + d).toDouble
    }
    assert(byTerm("pos")._5 == chi2(2, 0, 0, 2) &&
      byTerm("pos")._4 == 2L && byTerm("pos")._3 == 2L)
    assert(byTerm("neg")._5 == chi2(0, 2, 2, 0) && byTerm("neg")._4 == 0L)
    assert(byTerm("mix")._5 == 0.0)
    // rank: pos/neg tie on chi2=4, term ASC breaks it; mix last
    assert(got.sortBy(_._1).map(_._2).toSeq == Seq("neg", "pos", "mix"))
  }

  test("chi2Terms degenerate classes yield zero rows, never a throw") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "b c"))
      .toDF("doc_id", "text")
    // empty class: (a+c) = n_pos = 0 divided the old chain
    assert(TextAnalysis.chi2Terms(docs, "doc_id", "text", lit(false),
      minDf = 1L, k = 10).count() == 0L)
    // all-positive class: (b+d) = 0
    assert(TextAnalysis.chi2Terms(docs, "doc_id", "text", lit(true),
      minDf = 1L, k = 10).count() == 0L)
  }

  test("chi2Terms counts NULL labels as class-negative (oracle CASE parity)") {
    val docs = Seq((1L, Some("en"), "w x"), (2L, None, "w y"),
      (3L, Some("de"), "w z")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.chi2Terms(docs, "doc_id", "text",
      col("lang") === "en", minDf = 1L, k = 10)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._2 -> r).toMap
    // "w" in all 3 docs → dropped (df = n_docs); NULL-lang doc 2 must
    // count as negative, so n_pos = 1 and a("y") = 0 — NOT NULL
    assert(got("y")._4 == 0L)
    assert(got("x")._4 == 1L)
    assert(got.contains("z") && got("z")._4 == 0L)
  }

  // ---- bloom_prefilter ----

  test("prefilterStats: n_missed pinned 0, tallies consistent with exact join") {
    val fact = (1L to 300L).map(k => (k % 60, s"row$k")).toDF("fk", "pay")
    val dim = (0L to 59L by 3).map(k => (k, s"d$k")).toDF("dk", "pay")
    val r = BloomJoin.prefilterStats(fact, "fk", dim, "dk")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val (nFact, nKeys, nCand, nTrue, nFp, nMissed) = r
    // Bloom filters have no false negatives — nonzero n_missed is a bug
    assert(nMissed == 0L)
    assert(nFact == 300L && nKeys == 60L)
    // ground truth by brute force: keys 0,3,...,57 → 20 keys × 5 rows
    assert(nTrue == 300L / 60L * 20L)
    assert(nCand == nTrue + nFp)
    assert(nCand <= nFact)
    // 65536-bit filter with 20 keys × 3 probes: false positives across
    // only 40 non-member keys are overwhelmingly unlikely
    assert(nFp == 0L)
  }

  test("BloomJoin constants: filter size derives from the probe hex width") {
    assert(BloomJoin.Bits == 1 << (BloomJoin.HexPerProbe * 4))
    assert(BloomJoin.Probes * BloomJoin.HexPerProbe <= 32)
  }
}
