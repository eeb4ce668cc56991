package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusPipeline

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog and runs away"),
    (2L, "en", "  THE quick   brown fox jumps over the lazy dog and runs away"), // exact dup of 1
    (3L, "en", "the quick brown fox jumps over the lazy cat and runs away"),     // near dup of 1
    (4L, "en", "!!! ??? *** ### $$$ %%%"),                                       // junk -> quality gate
    (5L, "de", "der hund und die katze ist nicht hier aber der hund kommt"),
    (6L, "en", "completely different text about distributed query engines and columnar storage"))
    .toDF("doc_id", "lang", "text")
    .withColumn("n_chars", length(col("text")))

  test("curate: exact dup, junk and near dup removed; stats per language") {
    val block = lit("all")
    val curated = CorpusPipeline.curate(docs, "doc_id", "text", block)
    val ids = curated.select("doc_id").as[Long].collect().toSet
    // 2 exact-dup loses to 1; 3 near-dup (jaccard >= 0.6) loses to 1;
    // 4 junk gated out; 1, 5, 6 survive
    assert(ids == Set(1L, 5L, 6L))

    val st = CorpusPipeline.stats(curated)
      .select("lang_pred", "n_docs").as[(String, Long)].collect().toMap
    assert(st("en") == 2L && st("de") == 1L)
  }
}
