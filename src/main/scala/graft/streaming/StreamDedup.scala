package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming exact deduplication: fingerprint each document and use
  * Structured Streaming's `dropDuplicates` state store, bounded by a
  * watermark so state for old fingerprints ages out (without the
  * watermark, state grows with the corpus — the 100 TB failure mode).
  *
  * {{{
  *   val docs = spark.readStream...   // ts: Timestamp, text: String
  *   StreamDedup.distinctDocs(docs, "ts", "text", "10 minutes")
  * }}}
  */
object StreamDedup {
  def distinctDocs(docs: DataFrame, tsCol: String, textCol: String,
                   watermark: String): DataFrame =
    docs
      .withColumn("fingerprint", Dedup.normText(col(textCol)))
      .withColumn("fingerprint", md5(col("fingerprint")))
      .withWatermark(tsCol, watermark)
      // dropDuplicatesWithinWatermark (not plain dropDuplicates): state
      // for a fingerprint is evictable once the watermark passes it
      .dropDuplicatesWithinWatermark("fingerprint")
}
