package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-feature annotation: for each point, the closest interval
  * within `maxDist` (distance 0 when contained) — the "nearest gene"
  * query of variant browsers, and the genomic cousin of an as-of join.
  *
  * Composition, not a custom physical operator: candidates come from the
  * binned [[RangeJoin]] against intervals widened by `maxDist` (bounded
  * fan-out), then one window picks the minimum distance per point. Both
  * stages are Catalyst-planned; nothing Spark lacks is needed.
  */
object NearestFeature {

  /** Points must be unique on (keys, pos) — pre-aggregate duplicates
    * (the window below keeps one row per (keys, pos) group).
    *
    * @return one row per point that has a feature within `maxDist`:
    *         point columns + feature columns + `distance` (+ ties broken
    *         by earliest interval start, then feature order column). */
  def nearest(points: DataFrame, intervals: DataFrame, pos: String,
              start: String, stop: String, tieCol: String,
              keys: Seq[String], maxDist: Long,
              binWidth: Long = 1 << 20): DataFrame = {
    val widened = intervals
      .withColumn("__wstart", col(start) - maxDist)
      .withColumn("__wstop", col(stop) + maxDist)
    val cand = RangeJoin.joined(points, widened, pos, "__wstart", "__wstop",
        keys, binWidth)
      .withColumn("distance",
        greatest(lit(0L), col(start) - col(pos), col(pos) - col(stop)))
    val w = Window
      .partitionBy((keys :+ pos).map(col): _*)
      .orderBy(col("distance").asc, col(start).asc, col(tieCol).asc)
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__wstart", "__wstop")
  }
}
