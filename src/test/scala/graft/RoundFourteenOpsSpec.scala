package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: the probe-many IVF serving path (dataset-keyed
  * index table + idempotent ensure), and the round's scale/parity
  * fixes.
  */
class RoundFourteenOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ivfIndexTable: dataset-keyed, stable, catalog-safe") {
    val a = Similarity.ivfIndexTable("/root/testdata/sf0.01")
    val b = Similarity.ivfIndexTable("/root/testdata/sf0.1")
    // keyed: two dirs never share a table (the r13 ADVICE race: a fixed
    // global name let one scale factor probe another's lists)
    assert(a != b)
    // stable: same dir → same name (the ensure path depends on it)
    assert(a == Similarity.ivfIndexTable("/root/testdata/sf0.01"))
    // catalog-safe identifier
    assert(a.matches("graft_ivf_index_[0-9a-f]{10}"))
  }

  test("ivfEnsureIndex: builds once, second call is a no-op") {
    val rnd = new scala.util.Random(14L)
    val emb = (0L until 150L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val cent = Similarity.ivfQuantizer(16, 64)
    val table = "graft_ivf_ensure_spec"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    Similarity.ivfEnsureIndex(emb, "vec_id", "embedding", cent, table, buckets = 4)
    assert(spark.catalog.tableExists(table))
    // fingerprint the files the first build wrote…
    val warehouse = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, table)
    def listing(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = listing()
    // …a second ensure with DIFFERENT corpus rows must not rewrite:
    // existence IS the index (dataset-keyed names make that sound)
    Similarity.ivfEnsureIndex(emb.filter($"vec_id" < 10L),
      "vec_id", "embedding", cent, table, buckets = 4)
    assert(listing() == before, "second ensure must not touch the files")
    // and the table still probes like the fused in-memory search
    val q = emb.filter($"vec_id" % 30 === 0)
    val fromDisk = Similarity.ivfProbeIndex(spark, table, q,
      "vec_id", "embedding", cent, k = 3, nprobe = 2)
      .select("query_id", "corpus_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val fused = Similarity.ivfSearch(emb, q, "vec_id", "embedding", cent,
      k = 3, nprobe = 2)
      .select("query_id", "corpus_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fromDisk == fused)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  test("budgetSelect: one-bin-concentrated scores — no corpus-sized window") {
    import graft.operators.Selection
    // adversarial distribution (VERDICT r13 item 6): binWidth 2^40 puts
    // EVERY document in bin 0 — the degenerate quantile-concentration
    // case. The r13 shape would window the whole corpus in one
    // partition; the two-level prefix must keep doc-level partitions
    // keyed by the exact score too.
    val rnd = new scala.util.Random(41L)
    val rows = (1 to 400).map { i =>
      val words = (0 until 5 + rnd.nextInt(20))
        .map(_ => "a" * (3 + rnd.nextInt(5)))
      (i.toLong, "s" + (i % 3), words.mkString(" "))
    }
    val docs = rows.toDF("doc_id", "src", "text")
    val sel = Selection.budgetSelect(docs, "doc_id", "text", "src",
      binWidth = 1L << 40)
    // reference: exact greedy prefix on the driver, same arithmetic
    val scored = rows.map { case (id, src, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val n = ws.length.toLong
      (id, src, math.round(10000.0 * ws.map(_.length.toLong).sum / n), n)
    }
    val totalToks = scored.map(_._4).sum
    val budget = totalToks * 4 / 10
    var cum = 0L
    val expect = scored.sortBy(t => (-t._3, t._1)).iterator.map { t =>
      cum += t._4; (t._1, t._2, t._3, t._4, cum)
    }.takeWhile(_._5 <= budget).toSeq
    val got = sel.as[(Long, String, Long, Long, Long)].collect()
      .sortBy(_._5)
    assert(got.toSeq == expect)
    // plan invariant: every window over DOC rows partitions by the
    // exact score too; bin-only / unpartitioned windows are allowed
    // only over aggregated (bounded) frames
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.{
      HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: allNodes(a.executedPlan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val nodes = allNodes(sel.queryExecution.executedPlan)
    val wins = nodes.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    for (w <- wins) {
      val keys = w.partitionSpec.map(_.toString)
      val docLevel = keys.exists(_.contains("score4"))
      val aggBelow = allNodes(w.child).exists {
        case _: HashAggregateExec | _: ObjectHashAggregateExec |
             _: SortAggregateExec => true
        case _ => false
      }
      assert(docLevel || aggBelow,
        s"window partitioned by $keys runs over raw doc rows:\n$w")
    }
  }

  test("StreamAttribution across triggers equals the batch as-of join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamAttribution
    import graft.operators.EventOps
    implicit val sqlCtx = spark.sqlContext
    val horizon = 1000000L // 1s lookback
    // touches: (user, us, channel); conversions: (user, us)
    val touches1 = Seq(("u1", 100000L, "email"), ("u1", 500000L, "ad"),
      ("u2", 200000L, "search"))
    val touches2 = Seq(("u1", 700000L, "social"), // late-arriving touch
      ("u3", 900000L, "ad"),
      // watermark pushers: far-future rows let append-mode results flush
      ("wm", 100000000L, "x"))
    val convs1 = Seq(("u1", 800000L)) // sees email/ad now, social late
    val convs2 = Seq(("u2", 300000L), // in-horizon search touch
      ("u2", 2000000L), // touch out of horizon → no row (inner join)
      ("wm2", 100000000L))
    val memT = MemoryStream[(String, Long, String)]
    val memC = MemoryStream[(String, Long)]
    val q = StreamAttribution.lastTouch(
        memC.toDF().toDF("user_id", "us"),
        memT.toDF().toDF("user_id", "us", "channel"),
        horizonUs = horizon, delay = "2 seconds")
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      memT.addData(touches1: _*); memC.addData(convs1: _*)
      q.processAllAvailable()
      memT.addData(touches2: _*); memC.addData(convs2: _*)
      q.processAllAvailable()
      // one more empty-ish batch so the advanced watermark finalizes
      memT.addData(("wm", 200000000L, "x")); memC.addData(("wm3", 200000000L))
      q.processAllAvailable()
      val streamed = spark.table("attr_stream")
        .select(col("user_id"),
          unix_micros(col("conv_t")).as("conv_us"),
          unix_micros(col("touch_t")).as("touch_us"), col("channel"))
        .filter(!col("user_id").startsWith("wm"))
        .as[(String, Long, Long, String)].collect().toSet
      // the LATE u1 touch (700000, arrived batch 2, within the 2s
      // delay) must win last-touch for the batch-1 conversion
      assert(streamed == Set(
        ("u1", 800000L, 700000L, "social"),
        ("u2", 300000L, 200000L, "search")))
      // batch parity: asOfJoin over the pooled data, attributed half
      val allT = (touches1 ++ touches2).toDF("user_id", "tus", "channel")
      val allC = (convs1 ++ convs2).toDF("user_id", "us")
      val batch = EventOps.asOfJoin(allC, allT, "user_id",
          col("us"), col("tus"), Seq("channel"))
        .filter(col("asof_ts").isNotNull &&
          col("us") - col("asof_ts") <= horizon)
        .filter(!col("user_id").startsWith("wm"))
        .select(col("user_id"), col("us"), col("asof_ts"),
          col("asof_channel"))
        .as[(String, Long, Long, String)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("resizeImagesTagged / sceneCutsTagged: explicit quarantine rows") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{MediaCodec, MediaRow}
    // resize: a real 16×16 BMP resizes (flag true, bytes change); the
    // JPEG header and the 8-bit BMP pass through BYTE-IDENTICAL with
    // flag false
    val bmp = MediaCodec.bmpWithPixels(16, 16,
      (x, y) => if ((x + y) % 2 == 0) 0 else 0xFFFFFF)
    val imgs = Seq(
      MediaRow(1L, "image", bmp),
      MediaRow(2L, "image", Multimodal.jpegHeaderBytes),
      MediaRow(3L, "image", Multimodal.bmp8Bytes)).toDS()
    val rz = Multimodal.resizeImagesTagged(imgs, 8, 8)
      .as[(Long, Boolean, Array[Byte])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(rz(1L)._1 && !java.util.Arrays.equals(rz(1L)._2, bmp))
    assert(java.util.Arrays.equals(rz(1L)._2,
      MediaCodec.resizeBmp(bmp, 8, 8).get))
    assert(!rz(2L)._1 &&
      java.util.Arrays.equals(rz(2L)._2, Multimodal.jpegHeaderBytes))
    assert(!rz(3L)._1 &&
      java.util.Arrays.equals(rz(3L)._2, Multimodal.bmp8Bytes))
    // scene cuts: a valid 3-frame AVI gets the SAME numbers as the
    // silent variant plus decoded=true; the truncated RIFF and the MP4
    // ftyp box emit explicit zero rows, not nothing
    val frames = (0 until 3).map(i =>
      Array.tabulate[Byte](16)(j => ((i * 40 + j) & 0x7f).toByte))
    val avi = MediaCodec.aviBytes(32, 24, frames)
    val vids = Seq(
      MediaRow(10L, "video", avi),
      MediaRow(11L, "video", Multimodal.truncatedRiffVideoBytes),
      MediaRow(12L, "video", Multimodal.mp4FtypBytes)).toDS()
    val tag = Multimodal.sceneCutsTagged(vids, threshold = 100L)
      .as[(Long, Boolean, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(tag.keySet == Set(10L, 11L, 12L))
    val silent = Multimodal.sceneCuts(vids, threshold = 100L).collect()
    assert(silent.length == 1 && silent.head.media_id == 10L)
    val s = silent.head
    assert(tag(10L) == ((10L, true, s.n_frames, s.n_pairs, s.sum_delta,
      s.n_cuts)))
    assert(tag(11L) == ((11L, false, 0L, 0L, 0L, 0L)))
    assert(tag(12L) == ((12L, false, 0L, 0L, 0L, 0L)))
  }

  test("holtMase: hand series with a gap — both parents' numbers in one row") {
    import graft.operators.EventOps
    // 10-day span, day 4 missing (zero-filled): counts
    // [3,1,4,1,0,9,2,6,5,3] after densify — the r13 seasonal-naive
    // fixture, so the naive7 half is hand-checked against that spec
    val us = 86400000000L
    val observed = Map(0 -> 3, 1 -> 1, 2 -> 4, 3 -> 1, 5 -> 9, 6 -> 2,
      7 -> 6, 8 -> 5, 9 -> 3)
    val rows = observed.toSeq.flatMap { case (d, n) =>
      (0 until n).map(i => ("a", d * us + i))
    }.toDF("event_type", "ts_us")
    val dense = (0 to 9).map(d => observed.getOrElse(d, 0))
    // Holt walk-forward fold by hand (α=0.5, β=0.25, seed l=x₀, b=0;
    // error banked pre-update, ×1e4-rounded per step)
    var (l, b, s4) = (dense(0).toDouble, 0.0, 0.0)
    for (x <- dense.tail) {
      s4 += math.round(math.abs(x - (l + b)) * 10000).toDouble
      val lNew = 0.5 * x + 0.5 * (l + b)
      b = 0.25 * (lNew - l) + 0.75 * b
      l = lNew
    }
    val s7 = (7 to 9).map(i => math.abs(dense(i) - dense(i - 7))).sum
    val got = EventOps.holtMase(rows, "event_type", col("ts_us"),
        alpha = 0.5, beta = 0.25)
      .select("n_days", "n_evals", "holt_sum_abs_err4", "holt_mae4",
        "naive7_sum_abs", "naive7_mae4", "mase4")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == ((10L, 9L, s4.toLong, math.round(s4 / 9),
      s7.toLong, math.round(10000.0 * s7 / 3),
      math.round(s4 * 3 / (9.0 * s7)))))
  }

  test("dailyAutocorr: densified — gap days correlate as true zeros") {
    import graft.operators.EventOps
    val us = 86400000000L
    val observed = Map(0 -> 3, 1 -> 1, 2 -> 4, 3 -> 1, 5 -> 9, 6 -> 2,
      7 -> 6, 8 -> 5, 9 -> 3)
    val rows = observed.toSeq.flatMap { case (d, n) =>
      (0 until n).map(i => ("a", d * us + i))
    }.toDF("event_type", "ts_us")
    val dense = (0 to 9).map(d => observed.getOrElse(d, 0).toLong)
    def r4(k: Int): (Long, Option[Long]) = {
      val pairs = (k to 9).map(i => (dense(i), dense(i - k)))
      val np = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val (vx, vy) = (np * sxx - sx * sx, np * syy - sy * sy)
      (np, if (vx > 0 && vy > 0)
        Some(math.round(10000.0 * (np * sxy - sx * sy)
          / (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble))))
      else None)
    }
    val got = EventOps.dailyAutocorr(rows, "event_type", col("ts_us"))
      .orderBy("lag")
      .select("lag", "n_pairs", "r4")
      .as[(Long, Long, Option[Long])].collect()
    assert(got.length == 7)
    for ((lag, np, r) <- got) {
      val (expNp, expR) = r4(lag.toInt)
      // a dense 10-day span pairs exactly 10−k days — the gap day is IN
      assert(np == expNp, s"lag $lag")
      assert(r == expR, s"lag $lag")
    }
  }
}
