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

  test("multimodal stub plumbing produces deterministic features") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(docs, "doc_id")).collect()
    assert(feats.length == 3)
    assert(feats.forall(_.n_bytes == 128))
    assert(feats.map(_.kind).toSet.subsetOf(Set("image", "audio", "video")))
    val audio = feats.filter(_.kind == "audio")
    assert(audio.forall(_.height == 1))
    // determinism: same input -> same checksum
    val again = Multimodal.extractFeatures(
      Multimodal.syntheticMedia(docs, "doc_id")).collect()
    assert(feats.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
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
