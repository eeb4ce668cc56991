package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextAnalysis}
import graft.streaming.EventRates

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("language id picks the marker-heavy language") {
    val df = Seq(
      "the cat and the dog of the house is to be",
      "der hund und die katze ist nicht hier",
      "le chat et la maison les deux des amis",
      "el perro de la casa que los gatos",
      "xyzzy plugh 42").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("token count and fingerprint") {
    val df = Seq("  Hello   World ", "", "one").toDF("text")
      .select(TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 0, 1))
    // fingerprint is md5 of "hello world"
    assert(rows(0).getString(1) == "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("quality scoring orders clean text above junk") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away home"),
      (2L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
      (3L, "ok")).toDF("doc_id", "text")
    val feats = TextAnalysis.qualityFeatures(col("text"))
    val out = df.select(col("doc_id") +: feats.map { case (n, c) => c.as(n) }: _*)
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(out(1L) > 90.0)
    assert(out(2L) < out(1L))
    assert(out(3L) <= 50.0) // short-text penalty
  }

  test("multimodal header codec recovers BMP and WAV metadata") {
    val docs = Seq((3L, "a"), (4L, "b"), (5L, "c")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(docs, "doc_id")).collect()
      .map(f => f.media_id -> f).toMap
    // id 3 -> image: real BMP header, width 16+3, height 16+21
    assert(feats(3L).kind == "image" && feats(3L).width == 19 &&
      feats(3L).height == 37 && feats(3L).n_bytes == 54)
    // id 4 -> audio: WAV, sampleRate 8000+4*1000, channels 1
    assert(feats(4L).kind == "audio" && feats(4L).width == 12000 &&
      feats(4L).height == 1 && feats(4L).n_bytes == 44)
    // id 5 -> video: real minimal AVI, avih width 32+5, height 24+5,
    // 1 + 5%3 = 3 frame chunks -> 124 + 24*2 bytes
    assert(feats(5L).kind == "video" && feats(5L).width == 37 &&
      feats(5L).height == 29 && feats(5L).n_bytes == 172)
  }

  test("tf-idf: rare terms outrank common ones, scores hand-checked") {
    // "common" appears in all 3 docs (idf floor), "rare" only in doc 1
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common common other"),
      (3L, "common thing")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopK(docs, "doc_id", "text", k = 2)
      .select("id", "term", "tfidf", "rank")
      .as[(Long, String, Double, Int)].collect()
      .map(r => (r._1, r._4) -> (r._2, r._3)).toMap
    // doc 1 top term is "rare": tf=2, idf=round(ln(4/2)+1,4)=1.6931
    assert(out((1L, 1))._1 == "rare")
    assert(out((1L, 1))._2 == 2 * 1.6931)
    // "common" (df=3): idf=round(ln(4/4)+1,4)=1.0 -> tf*1.0
    assert(out((1L, 2)) == (("common", 1.0)))
    assert(out((2L, 1))._1 == "common" && out((2L, 1))._2 == 2.0)
    // doc 3: the rare term ("thing", df=1) outranks the universal one
    assert(out((3L, 1)) == (("thing", 1.6931)))
    assert(out((3L, 2)) == (("common", 1.0)))
  }

  test("unigram surprisal: rare words score high, values hand-checked") {
    // counts: a=2, b=2, c=1, total=5
    // su(a)=su(b)=round(-log2(2/5)*1e4)=13219; su(c)=round(-log2(1/5)*1e4)=23219
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ((3L, 1.3219)))           // 3*13219/1e4/3
    assert(out(2L) == ((2L, 1.8219)))           // (13219+23219)/1e4/2
  }

  test("winnowing: shared substring >= k+window-1 shares a fingerprint") {
    val common = "the identical long shared passage of text"
    val docs = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"другой prefix $common other ending"),
      (3L, "nothing in common with either document here at all")).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    // guarantee: any shared run of >= k+window-1 chars yields >= 1 shared
    // selected fingerprint (the window over the shared grams picks the
    // same minimum in both docs)
    assert((fps(1L) & fps(2L)).nonEmpty)
    // selection compresses: far fewer fingerprints than grams
    val n1 = docs.filter($"doc_id" === 1L).select($"text").head.getString(0)
    assert(fps(1L).size < n1.length - 4)
    assert((fps(1L) & fps(3L)).size <= 1) // unrelated docs ~disjoint
  }

  test("winnow candidates pair overlapping docs, drop boilerplate fps") {
    val common = "the identical long shared passage of text"
    val docs = Seq(
      (1L, s"first document with $common and more"),
      (2L, s"second document also containing $common here"),
      (3L, "nothing in common with either document at all")).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) >= 2)
    // the overlapping pair shares strictly more fingerprints than any
    // incidental single-word overlap with the unrelated doc
    assert(pairs((1L, 2L)) > pairs.getOrElse((1L, 3L), 0L))
    assert(pairs((1L, 2L)) > pairs.getOrElse((2L, 3L), 0L))
  }

  test("BMP resize: nearest-neighbor pixels, non-resizable passthrough") {
    import Multimodal.{MediaCodec, MediaRow}
    // 2x2 source, distinct corner colors (0xRRGGBB)
    val colors = Array(Array(0xFF0000, 0x00FF00), Array(0x0000FF, 0xFFFFFF))
    val src = MediaCodec.bmpWithPixels(2, 2, (x, y) => colors(y)(x))
    val out = MediaCodec.resizeBmp(src, 4, 4).get
    assert(MediaCodec.decode(out) == ((4, 4)))
    // target (3,3) maps to source (1,1) = white; (0,0) -> red. Rows are
    // bottom-up: top row y=0 sits at the END of the pixel array.
    val rowOut = 12 // 4px * 3B, already 4-byte aligned
    def px(x: Int, y: Int): Int = {
      val off = 54 + (4 - 1 - y) * rowOut + x * 3
      ((out(off + 2) & 0xff) << 16) | ((out(off + 1) & 0xff) << 8) | (out(off) & 0xff)
    }
    assert(px(0, 0) == 0xFF0000 && px(3, 3) == 0xFFFFFF)
    assert(px(3, 0) == 0x00FF00 && px(0, 3) == 0x0000FF)
    // dataset-level: image resized, audio/headerless image pass through
    val media = Seq(
      MediaRow(1L, "image", src),
      MediaRow(2L, "image", MediaCodec.bmpBytes(8, 8)), // no pixel data
      MediaRow(3L, "audio", MediaCodec.wavBytes(8000, 1))).toDS()
    val resized = Multimodal.resizeImages(media, 4, 4).collect()
      .map(r => r.media_id -> r).toMap
    assert(MediaCodec.decode(resized(1L).payload) == ((4, 4)))
    assert(MediaCodec.decode(resized(2L).payload) == ((8, 8)))
    assert(resized(3L).payload.sameElements(MediaCodec.wavBytes(8000, 1)))
  }

  test("frame sampling: every-Nth frame off a real AVI movi index; " +
      "non-AVI containers quarantine") {
    import Multimodal.{MediaCodec, MediaRow}
    // 5 frames with distinct, distinct-length contents — chunk padding
    // (odd sizes pad to even) and offsets must both be honored
    val payloads = (0 until 5).map(i => Array.fill(15 + i)((i * 11).toByte))
    val avi = MediaCodec.aviBytes(320, 240, payloads)
    val media = Seq(
      MediaRow(1L, "video", avi),
      MediaRow(2L, "video", Array[Byte](0, 0, 0, 32, 'f', 't', 'y', 'p')),
      MediaRow(3L, "image", avi)).toDS() // right bytes, wrong kind
    val frames = Multimodal.sampleFrames(media, everyN = 2).collect()
    // only the AVI video row contributes; mp4-ish row quarantines
    assert(frames.map(_.media_id).distinct.toSeq == Seq(1L))
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    frames.foreach(f =>
      assert(f.frame.sameElements(payloads(f.frame_idx))))
    // header decode reads the avih dimensions off the same container
    assert(MediaCodec.decode(avi) == ((320, 240)))
    // the index parse agrees with the synthesis on count and order
    assert(MediaCodec.aviFrameRanges(avi).get.length == 5)
    assert(MediaCodec.aviFrameRanges(Array[Byte](1, 2, 3)).isEmpty)
    // interleaved-mux layout: frames grouped in 'LIST rec ' inside movi
    // must yield the same index (the parser descends into rec groups)
    val rec = MediaCodec.aviBytes(320, 240, payloads, recWrap = true)
    val recRanges = MediaCodec.aviFrameRanges(rec).get
    assert(recRanges.length == 5)
    recRanges.zipWithIndex.foreach { case ((off, len), i) =>
      assert(java.util.Arrays.copyOfRange(rec, off, off + len)
        .sameElements(payloads(i)))
    }
  }

  test("binaryFile source end-to-end: real files through the codec") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media")
    java.nio.file.Files.write(dir.resolve("pic.bmp"),
      Multimodal.MediaCodec.bmpBytes(640, 480))
    java.nio.file.Files.write(dir.resolve("clip.wav"),
      Multimodal.MediaCodec.wavBytes(44100, 2))
    java.nio.file.Files.write(dir.resolve("movie.mp4"),
      Array[Byte](0, 0, 0, 32, 'f', 't', 'y', 'p'))
    val feats = Multimodal.extractFeatures(
      Multimodal.fromBinaryFiles(spark, dir.toString)).collect()
      .map(f => f.kind -> f).toMap
    assert(feats("image").width == 640 && feats("image").height == 480)
    assert(feats("audio").width == 44100 && feats("audio").height == 2)
    assert(feats("video").width == 0 && feats("video").height == 0)
  }
}

class EventRatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch windowing floors to 5-minute buckets") {
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:30"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:04:59"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 00:05:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 00:05:01"), "view", 8.0))
      .toDF("ts", "event_type", "value")
    val out = EventRates.windowedBatch(rows)
      .select("window_epoch", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    assert(out == Set(
      (t0, "click", 2L, 3.0),
      (t0 + 300, "click", 1L, 4.0),
      (t0 + 300, "view", 1L, 8.0)))
  }

  test("sliding windows: each event lands in exactly width/slide buckets") {
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:30"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:07:00"), "click", 2.0))
      .toDF("ts", "event_type", "value")
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000
    val out = EventRates.slidingBatch(rows)
      .as[(Long, String, Long, Double)].collect().toSet
    // 00:00:30 -> windows starting 00:00 and 23:55-of-prev-day;
    // 00:07:00 -> windows starting 00:05 and 00:00
    assert(out == Set(
      (t0 - 300, "click", 1L, 1.0),
      (t0, "click", 2L, 3.0),
      (t0 + 300, "click", 1L, 2.0)))
    // the struct-window formulation selects the same buckets
    val viaWindow = EventRates.sliding(rows)
      .select(unix_timestamp(col("window_start")).as("window_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))
      .as[(Long, String, Long, Double)].collect().toSet
    assert(viaWindow == out)
  }

  test("streaming path: same aggregation incrementally via readStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val agg = EventRates.windowed(
      mem.toDF().toDF("ts", "event_type", "value").withWatermark("ts", "10 minutes"))
    val q = agg.writeStream.format("memory").queryName("er_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(
        (Timestamp.valueOf("2024-01-01 00:00:30"), "click", 1.0),
        (Timestamp.valueOf("2024-01-01 00:04:59"), "click", 2.0),
        (Timestamp.valueOf("2024-01-01 00:05:01"), "view", 8.0))
      q.processAllAvailable()
      val got = spark.table("er_out")
        .select(col("window_start").cast("string"), col("event_type"),
          col("n_events"), col("sum_value"))
        .as[(String, String, Long, Double)].collect().toSet
      assert(got == Set(
        ("2024-01-01 00:00:00", "click", 2L, 3.0),
        ("2024-01-01 00:05:00", "view", 1L, 8.0)))
    } finally q.stop()
  }
}
