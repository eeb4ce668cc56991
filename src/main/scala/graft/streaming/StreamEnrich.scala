package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Streaming dimension enrichment — the stream-static broadcast join
  * that replaces the reference's per-row JDBC lookups (the gene/
  * transcript HashMap caches of VariantRatLoaderFromDb and friends) in
  * an incremental pipeline: the dimension is fixed at query start and
  * every micro-batch joins map-side against its broadcast copy.
  *
  * Like [[StreamDecontam]], the point is the SHAPE: a stream-static
  * equi-join is the one streaming join with zero state, no watermark,
  * and replay idempotence. Enriching against a *changing* dimension is
  * a different operator (stream-stream join or a periodic restart with
  * a re-snapshot) — silently treating this one as that one is how
  * stale-dimension bugs ship at scale.
  */
object StreamEnrich {

  /** Left-join each micro-batch of `stream` against the broadcast
    * static `dim` on `cond`. Rows without a match pass through with
    * nulls (append-safe: enrichment never drops or delays facts). */
  def withDim(stream: DataFrame, dim: DataFrame, cond: Column): DataFrame =
    stream.join(broadcast(dim), cond, "left")
}
