package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming NEAR-duplicate detection — the streaming twin of
  * [[graft.operators.Dedup.simhashCandidates]].
  *
  * Each incoming document computes its 60-bit simhash locally (the
  * scalar kernel — no shuffle aggregation, so the plan has exactly ONE
  * stateful operator) and fans out to `maxHamming`+1 pigeonhole block
  * keys. Per (block, key) group, `flatMapGroupsWithState` keeps the most
  * recent signatures; an arrival whose exact hamming distance to a
  * stored signature is ≤ `maxHamming` emits a [[StreamNearDedup.Hit]].
  * The pigeonhole guarantee carries over from the batch stage: a true
  * ≤ maxHamming pair always shares a block, so within the retention
  * window no near-dup is missed.
  *
  * State bounds (the 100 TB discipline): entries per bucket are capped
  * at `maxPerBucket` (oldest evicted first) and whole groups age out via
  * event-time timeout `retentionMs` past the watermark — state is
  * O(active buckets × maxPerBucket), never O(stream).
  *
  * A pair sharing several blocks can emit up to maxHamming+1 identical
  * hits (one per block); they carry the same (doc_id, matched_id), so a
  * downstream `dropDuplicatesWithinWatermark` or batch distinct collapses
  * them.
  */
object StreamNearDedup {

  case class BlockEvent(blk: Int, key: Long, doc_id: Long, simhash: Long,
                        ts: Timestamp)
  case class BucketState(entries: List[(Long, Long, Long)]) // (id, sig, tsMs)
  case class Hit(doc_id: Long, matched_id: Long, hamming: Int)

  /** @param docs streaming frame with `tsCol` (Timestamp), `idCol`
    *             (Long), `textCol` (String)
    * @param watermark event-time watermark (e.g. "10 minutes")
    * @param retentionMs how long a bucket's signatures stay matchable
    */
  def nearDupHits(docs: DataFrame, tsCol: String, idCol: String,
                  textCol: String, watermark: String,
                  maxHamming: Int = 3, maxPerBucket: Int = 256,
                  retentionMs: Long = 600000L): Dataset[Hit] = {
    require(maxHamming >= 0 && 60 % (maxHamming + 1) == 0,
      "maxHamming+1 must divide 60")
    val spark = docs.sparkSession
    import spark.implicits._
    val nBlocks = maxHamming + 1
    val bits = 60 / nBlocks
    val mask = (1L << bits) - 1

    val events = docs
      // same token-less gate as the batch path (also keeps a null text
      // from reaching the scalar kernel)
      .filter(col(textCol).isNotNull &&
        length(org.apache.spark.sql.functions.trim(col(textCol))) > 0)
      .select(col(idCol).cast("long"), col(tsCol), col(textCol))
      .as[(Long, Timestamp, String)]
      .flatMap { case (id, ts, text) =>
        val sig = Dedup.simhashScalar(text)
        (0 until nBlocks).iterator
          .map(b => BlockEvent(b, (sig >> (b * bits)) & mask, id, sig, ts))
      }
      .withWatermark("ts", watermark)

    events
      .groupByKey(e => (e.blk, e.key))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long), incoming: Iterator[BlockEvent],
         state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val hits = scala.collection.mutable.ListBuffer.empty[Hit]
            var maxTs = 0L
            // deterministic within-trigger order
            incoming.toSeq.sortBy(e => (e.ts.getTime, e.doc_id)).foreach { e =>
              // report EVERY stored match, not just the first — the
              // batch candidate stage emits all pairs, and a single
              // shared block may be a pair's only collision
              entries.foreach { en =>
                val h = java.lang.Long.bitCount(en._2 ^ e.simhash)
                if (h <= maxHamming && en._1 != e.doc_id)
                  hits += Hit(e.doc_id, en._1, h)
              }
              entries = ((e.doc_id, e.simhash, e.ts.getTime) :: entries)
                .take(maxPerBucket)
              maxTs = math.max(maxTs, e.ts.getTime)
            }
            state.update(BucketState(entries))
            state.setTimeoutTimestamp(maxTs + retentionMs)
            hits.iterator
          }
        })
  }
}
