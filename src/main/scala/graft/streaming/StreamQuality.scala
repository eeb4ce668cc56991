package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Curation

/** Streaming corpus-quality gate — the streaming twin of
  * [[graft.operators.Curation.repetitionProfile]].
  *
  * The repetition statistics come from the scalar one-pass
  * [[graft.functions.TextKernels.repStats]] kernel, so the gate is a
  * STATELESS map+filter: no shuffle, no stateful operator, no join back
  * to the source (a streaming self-join would turn a "stateless" filter
  * into a stream-stream join), no watermark — every micro-batch row is
  * scored and kept/dropped locally, and the streaming output is
  * row-identical to the batch gate (same kernel, same thresholds). This
  * is the shape that keeps a quality filter in front of stateful stages
  * (dedup, sessionization) without adding a second stateful operator to
  * the plan.
  */
object StreamQuality {

  /** Rows of `docs` (streaming or batch — the plan is identical) that
    * pass the repetition rules, with the profile columns attached. */
  def gate(docs: DataFrame, textCol: String,
           maxDupWordFrac: Double = 0.6,
           maxTopBigramFrac: Double = 0.2,
           maxDupTrigramFrac: Double = 0.6,
           minWords: Int = 5,
           maxMeanWordLen: Double = 12.0): DataFrame =
    Curation.repetitionGate(docs, textCol, maxDupWordFrac, maxTopBigramFrac,
      maxDupTrigramFrac, minWords, maxMeanWordLen)
}
