package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

import graft.operators.Curation

/** Streaming benchmark decontamination — the streaming twin of
  * [[graft.operators.Curation.decontaminate]], as an in-plan
  * STREAM-STATIC broadcast join (the one streaming join shape with no
  * state at all: the static side is fixed at query start, each
  * micro-batch's training grams join map-side against the broadcast
  * benchmark gram set).
  *
  * Deliberately emits (id, gram) HIT ROWS in append mode rather than the
  * batch twin's per-doc `n_shared` count: a `groupBy(id).count` on a
  * stream is a stateful aggregation that never evicts (doc ids are
  * unbounded), which is exactly the second-stateful-operator trap the
  * [[StreamQuality]] gate documents. Per-doc rollup belongs to the
  * downstream consumer (or the batch pass); the hit stream itself stays
  * stateless, watermark-free, and replay-idempotent. Within one
  * micro-batch the hits for a doc are exactly the batch twin's shared
  * grams (the gram kernel emits distinct grams per document).
  */
object StreamDecontam {

  /** Contamination hits for a streaming `train` frame against a STATIC
    * `bench` frame: one (id, gram) row per training document × shared
    * benchmark word n-gram. */
  def hits(train: DataFrame, bench: DataFrame, idCol: String,
           textCol: String, n: Int = 4): DataFrame = {
    val benchGrams = broadcast(
      Curation.wordGrams(bench, idCol, textCol, n).select("gram").distinct())
    Curation.wordGrams(train, idCol, textCol, n).join(benchGrams, "gram")
  }
}
