package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Round-10 additions. CMS heavy hitters: checked against an
  * independent in-test rebuild of the grid (brute-force-twin
  * convention), with enough keys to FORCE counter collisions so the
  * over-count path is exercised, not just the collision-free case. */
class RoundTenOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def cells(key: String): Seq[(Int, Long)] =
    (0 until Sketches.Depth).map { i =>
      i -> java.lang.Long.parseLong(
        md5hex(key).substring(i * Sketches.HexPerCell,
          (i + 1) * Sketches.HexPerCell), 16)
    }

  test("cmsTopK equals the hand-rebuilt grid; est never under-counts") {
    // 6000 distinct keys over 4096 columns per row: pigeonhole forces
    // collisions, so some estimate MUST over-count. Zipfish counts via
    // repetition of the low ids.
    val occ = (1 to 6000).flatMap { id =>
      val n = if (id <= 5) 50 - id * 5 else 1
      Seq.fill(n)(s"k$id")
    }
    val got = Sketches.cmsTopK(occ.toDF("term"), "term", 6000)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(got.length == 6000)

    // independent rebuild
    val cnt = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val grid = scala.collection.mutable.Map[(Int, Long), Long]()
      .withDefaultValue(0L)
    occ.foreach(k => cells(k).foreach(c => grid(c) += 1))
    val expEst = cnt.keys.map(k =>
      k -> cells(k).map(grid).min).toMap

    got.foreach { case (_, term, est, c, over) =>
      assert(c == cnt(term))
      assert(est == expEst(term), s"$term")
      assert(over == est - c && over >= 0L, s"$term under-counted")
    }
    // collisions actually happened (the test would silently weaken if
    // the grid were ever widened past the key count)
    assert(got.exists(_._5 > 0L), "no collision exercised the over path")
    // rank order: est desc, term asc, dense 1..n
    assert(got.map(_._1).toSeq == (1L to 6000L))
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
    case _ => }
  }

  test("CMS constants: width derives from the hex window, windows fit md5") {
    assert(Sketches.Width == 1 << (Sketches.HexPerCell * 4))
    assert(Sketches.Depth * Sketches.HexPerCell <= 32)
  }

  test("hllDistinct matches the hand-rebuilt registers on BOTH branches") {
    // group "big": 30k distinct keys → raw HLL branch (raw > 2.5m);
    // group "small": 200 distinct keys → linear-counting branch;
    // duplicates added to prove the register max is idempotent
    val rows = (1 to 30000).map(i => ("big", s"u$i")) ++
      (1 to 200).flatMap(i => Seq(("small", s"v$i"), ("small", s"v$i")))
    val got = graft.operators.Sketches
      .hllDistinct(rows.toDF("grp", "k"), "grp", "k")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // independent register rebuild
    def est(keys: Seq[String]): (Long, Double, Boolean) = {
      val regs = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      keys.distinct.foreach { k =>
        val h = md5hex(k)
        val b = java.lang.Long.parseLong(h.take(3), 16)
        val w = java.lang.Long.parseLong(h.substring(3, 11), 16)
        val rho = if (w == 0L) 33L
          else 33L - java.lang.Long.toBinaryString(w).length
        regs(b) = math.max(regs(b), rho)
      }
      val m = 4096.0
      val zeros = 4096 - regs.size
      val s = regs.values.map(v => 1.0 / (1L << v)).sum + zeros.toDouble
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val raw = alpha * m * m / s
      val linear = raw <= 2.5 * m && zeros > 0
      val e = if (linear) m * math.log(m / zeros.toDouble) else raw
      (regs.size.toLong,
        BigDecimal(e).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        linear)
    }
    val (bigRegs, bigEst, bigLinear) = est((1 to 30000).map(i => s"u$i"))
    val (smallRegs, smallEst, smallLinear) = est((1 to 200).map(i => s"v$i"))
    assert(got("big") == ((30000L, bigRegs, bigEst)))
    assert(got("small") == ((200L, smallRegs, smallEst)))
    // the two groups must actually take different estimator branches
    assert(!bigLinear && smallLinear)
    // accuracy: 1.04/sqrt(4096) ≈ 1.6% std error; assert within 5%
    assert(math.abs(bigEst - 30000.0) / 30000.0 < 0.05)
    assert(math.abs(smallEst - 200.0) / 200.0 < 0.05)
  }

  test("kmvSetOps matches the hand-merged sketches; saturated + exact-fallback") {
    // groups A (keys 1..2000) and B (1001..3000): union 3000, inter 1000;
    // duplicates in the input prove the distinct collapses them
    val rows = (1 to 2000).map(i => ("A", s"k$i")) ++
      (1001 to 3000).flatMap(i => Seq(("B", s"k$i"), ("B", s"k$i")))
    val got = graft.operators.Sketches
      .kmvSetOps(rows.toDF("g", "k"), "g", "k", "A", "B")
      .as[(Long, Long, Double, Double, Long)].collect().head

    def u(key: String): Double =
      java.lang.Long.parseLong(md5hex(key).take(12), 16).toDouble /
        281474976710656.0
    val K = graft.operators.Sketches.KmvK
    val skA = (1 to 2000).map(i => u(s"k$i")).sorted.take(K).toSet
    val skB = (1001 to 3000).map(i => u(s"k$i")).sorted.take(K).toSet
    val mergedK = (skA ++ skB).toSeq.sorted.take(K)
    val uK = mergedK.last
    val nBoth = mergedK.count(v => skA(v) && skB(v))
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val estU = (K - 1).toDouble / uK
    val estI = nBoth.toDouble / K.toDouble * ((K - 1).toDouble / uK)
    assert(got == ((3000L, 1000L, r4(estU), r4(estI), K.toLong)))
    // accuracy: std error ~1/sqrt(K-1) ≈ 8.9%; assert within 3 sigma
    assert(math.abs(estU - 3000.0) / 3000.0 < 0.27)
    assert(math.abs(estI - 1000.0) / 1000.0 < 0.55) // jaccard noise adds

    // under-K union → the sketch IS the value set: estimates exact
    val tiny = (1 to 30).map(i => ("A", s"t$i")) ++
      (20 to 50).map(i => ("B", s"t$i"))
    val g2 = graft.operators.Sketches
      .kmvSetOps(tiny.toDF("g", "k"), "g", "k", "A", "B")
      .as[(Long, Long, Double, Double, Long)].collect().head
    assert(g2 == ((50L, 11L, 50.0, 11.0, 50L)))
  }

  test("cmsBuild streams: final grid cell-identical to batch over any chop") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all = (1 to 900).map(i => s"k${i % 120}")
    val mem = MemoryStream[String]
    // complete mode: the grid is ≤ Depth·Width rows, snapshot-able
    val q = Sketches.cmsBuild(mem.toDF().toDF("term"), "term")
      .writeStream.format("memory").queryName("cms_grid")
      .outputMode("complete").start()
    try {
      all.grouped(400).foreach { chunk =>
        mem.addData(chunk); q.processAllAvailable()
      }
      val streamed = spark.table("cms_grid")
        .as[(Int, Long, Long)].collect().toSet
      val batch = Sketches.cmsBuild(all.toDF("term"), "term")
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("hllMerge: merged per-group sketches EQUAL the pooled-data sketch") {
    // the mergeability law: registers(A ∪ B) = max(registers(A),
    // registers(B)) — exact equality, the reason per-source sketches
    // combine without rescanning
    val a = (1 to 4000).map(i => ("A", s"k$i"))
    val b = (3001 to 7000).map(i => ("B", s"k$i"))
    val perGroup = graft.operators.Sketches
      .hllRegisters((a ++ b).toDF("g", "k"), "g", "k")
    val merged = graft.operators.Sketches.hllMerge(perGroup, "all")
    val pooled = graft.operators.Sketches.hllRegisters(
      (a ++ b).map(t => ("all", t._2)).toDF("g", "k"), "g", "k")
    assert(merged.as[(String, Long, Long)].collect().toSet ==
      pooled.as[(String, Long, Long)].collect().toSet)
    // and the estimate off the merged grid tracks the true union (7000)
    val est = graft.operators.Sketches.hllEstimate(merged)
      .as[(String, Long, Double)].collect().head._3
    assert(math.abs(est - 7000.0) / 7000.0 < 0.05)
  }

  test("HLL registers stream: stock max-agg, final grid identical to batch") {
    // like the CMS grid, the HLL register build is a bounded streaming
    // aggregation (max is order-free and mergeable): state = one long
    // per (group, bucket), ≤ groups·4096 forever
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val all = (1 to 600).map(i => ("g" + (i % 2), s"u${i % 250}"))
    val mem = MemoryStream[(String, String)]
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, "g", "k")
    val q = regs(mem.toDF().toDF("g", "k"))
      .writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      all.grouped(250).foreach { c => mem.addData(c); q.processAllAvailable() }
      val streamed = spark.table("hll_regs")
        .as[(String, Long, Long)].collect().toSet
      val batch = regs(all.toDF("g", "k")).as[(String, Long, Long)]
        .collect().toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally q.stop()
  }

  test("StreamEntropy's final rows match batch dailyEntropy across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamEntropy
    import graft.operators.EventOps
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext

    val dayUs = 86400000000L
    // three days, mixed types, deliberately chopped so every multi-event
    // day's counts accumulate ACROSS triggers
    val t1 = Seq((0L, "a"), (0L, "a"), (2L, "a"), (2L, "a"))
    val t2 = Seq((0L, "b"), (2L, "a"), (2L, "b"))
    val t3 = Seq((0L, "b"), (1L, "a"), (2L, "c"))

    val mem = MemoryStream[StreamEntropy.Ev]
    val q = StreamEntropy.entropy(mem.toDS())
      .writeStream.format("memory").queryName("se_out")
      .outputMode("append").start()
    try {
      mem.addData(t1.map(e => StreamEntropy.Ev(e._1, e._2)))
      q.processAllAvailable()
      mem.addData(t2.map(e => StreamEntropy.Ev(e._1, e._2)))
      q.processAllAvailable()
      mem.addData(t3.map(e => StreamEntropy.Ev(e._1, e._2)))
      q.processAllAvailable()
      // latest row per day (monotone n_events marks recency)
      val streamed = spark.table("se_out")
        .as[(Long, Long, Long, Long)].collect()
        .groupBy(_._1).map { case (d, rows) => rows.maxBy(_._2) }
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val batch = EventOps.dailyEntropy(
        (t1 ++ t2 ++ t3).map(e => (e._1 * dayUs + 5L, e._2))
          .toDF("us", "event_type"), "event_type", col("us"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(streamed == batch)
      assert(batch.keySet == Set(0L, 1L, 2L))
    } finally q.stop()
  }
}
