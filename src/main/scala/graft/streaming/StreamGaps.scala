package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.EventOps.burstiness]]'s gap
  * moments: per (type, user) running inter-event-gap statistics over an
  * unbounded stream via `flatMapGroupsWithState` — state per key is
  * FOUR LONGS (last timestamp + count + two moment sums), bounded
  * however long the stream runs (the 100 TB-safe shape: keys are the
  * type×user domain, state per key is constant).
  *
  * Gaps are the same exact integer minutes as the batch operator
  * (mod-subtract-then-divide — no float division), accumulated in exact
  * longs, so a key's final streaming row is bit-identical to the batch
  * lag-window moments on the same events regardless of trigger chop
  * (spec: 3-trigger chop == one batch). The per-TYPE burstiness rollup
  * is then one bounded agg over the emitted key moments — moments are
  * order-free sums, so the rollup commutes with streaming.
  *
  * Ordering contract: events for a key must arrive in event-time order
  * ACROSS triggers (within a trigger this fold sorts); a row older than
  * the key's last seen timestamp is dropped as watermark-late, mirroring
  * what an event-time watermark would have done upstream — counted
  * nowhere, exactly like Structured Streaming's late-row semantics.
  */
object StreamGaps {

  case class Ev(etype: String, user: Long, us: Long)
  case class GapState(lastUs: Long, n: Long, s1: Long, s2: Long)
  case class KeyMoments(etype: String, user: Long, nGaps: Long,
                        s1: Long, s2: Long)

  private val MinUs = 60000000L

  def moments(ev: Dataset[Ev])(implicit spark: SparkSession): Dataset[KeyMoments] = {
    import spark.implicits._
    ev.groupByKey(e => (e.etype, e.user))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Fold one trigger's events into the key's gap moments, emit the
    * updated row. Exposed for TestGroupState-style specs. */
  private[graft] def update(key: (String, Long), it: Iterator[Ev],
      state: GroupState[GapState]): Iterator[KeyMoments] = {
    val incoming = it.map(_.us).toArray.sorted
    if (incoming.isEmpty) return Iterator.empty
    var st = state.getOption.getOrElse(
      GapState(Long.MinValue, 0L, 0L, 0L))
    incoming.foreach { us =>
      if (st.lastUs == Long.MinValue) st = st.copy(lastUs = us)
      else if (us >= st.lastUs) { // older rows drop as watermark-late
        val d = us - st.lastUs
        val gap = (d - d % MinUs) / MinUs
        st = GapState(us, st.n + 1, st.s1 + gap, st.s2 + gap * gap)
      }
    }
    state.update(st)
    Iterator.single(KeyMoments(key._1, key._2, st.n, st.s1, st.s2))
  }
}
