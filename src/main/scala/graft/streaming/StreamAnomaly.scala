package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.EventOps.dailyAnomalies]]: per-key
  * z-score anomaly flagging over an unbounded stream of (key, bin, value)
  * observations via `flatMapGroupsWithState`, with the running profile
  * held in Welford form (count, mean, M2 — numerically stable one-pass
  * variance; Welford 1962) so state per key is THREE doubles however
  * long the stream runs: the 100 TB-safe shape, versus buffering a
  * window of history.
  *
  * An observation is scored against the profile of everything seen
  * STRICTLY BEFORE it (then folded in) — a monster spike flags on
  * arrival rather than first inflating the profile that judges it, and
  * results are independent of how the stream is chopped into triggers
  * (observations inside one trigger are sorted by bin; cross-trigger
  * order is the stream's responsibility — late data follows the
  * stream's watermark discipline).
  */
object StreamAnomaly {

  case class Obs(key: String, bin: Long, value: Double)
  case class Profile(n: Long, mean: Double, m2: Double)
  case class Anomaly(key: String, bin: Long, value: Double,
                     mean: Double, std: Double)

  def flag(obs: Dataset[Obs], zThresh: Double, minHistory: Int = 3)
          (implicit spark: SparkSession): Dataset[Anomaly] = {
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update(zThresh, minHistory))
  }

  /** One trigger's observations for one key → anomalies, updating the
    * Welford profile as a fold. Exposed for TestGroupState specs. */
  private[graft] def update(zThresh: Double, minHistory: Int)(
      key: String, it: Iterator[Obs],
      state: GroupState[Profile]): Iterator[Anomaly] = {
    var p = state.getOption.getOrElse(Profile(0L, 0.0, 0.0))
    val out = Seq.newBuilder[Anomaly]
    it.toArray.sortBy(_.bin).foreach { o =>
      if (p.n >= minHistory) {
        val variance = p.m2 / (p.n - 1) // sample variance, n >= 2
        val std = math.sqrt(variance)
        if (std > 0 && math.abs(o.value - p.mean) > zThresh * std)
          out += Anomaly(key, o.bin, o.value, p.mean, std)
      }
      // Welford fold AFTER scoring: the spike never judges itself
      val n1 = p.n + 1
      val d = o.value - p.mean
      val mean1 = p.mean + d / n1
      p = Profile(n1, mean1, p.m2 + d * (o.value - mean1))
    }
    state.update(p)
    out.result().iterator
  }
}
