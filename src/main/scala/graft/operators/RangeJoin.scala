package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join (the reference's GeneCache /
  * TranscriptFeatureCache lookups: "which gene/feature ranges contain this
  * position", GeneCache usage at VariantLoad3.java:682-694 and
  * VariantPostProcessing.java:225).
  *
  * The reference holds all intervals of one chromosome in a driver-side
  * HashMap. At 100 TB neither side fits anywhere, and a naive
  * `pos BETWEEN start AND stop` theta-join degenerates to a broadcast
  * nested loop. We re-express it as an equi-join:
  *
  *   1. pick a bin width W (≥ typical interval length, so intervals
  *      explode into ~1-2 bins);
  *   2. explode each interval to every bin it overlaps
  *      (`sequence(start div W, stop div W)`);
  *   3. equi-join points on (partitionKey, bin) — a plain shuffled hash /
  *      sort-merge join Catalyst can plan, with AQE skew-splitting;
  *   4. apply the residual `start <= pos AND pos <= stop` filter.
  *
  * Bins are uniform so no key dominates unless the data itself is skewed
  * (AQE handles that). When the interval side is dim-sized, Catalyst
  * broadcasts it — no shuffle on the fact side at all.
  */
object RangeJoin {

  /** Join `points` (with point column `pos`) to `intervals` (with
    * inclusive `start`/`stop` columns) on containment, equi-keyed by
    * `keys` (e.g. chromosome) plus the derived bin.
    *
    * All columns of both inputs are preserved (join keys once); callers
    * project afterwards.
    */
  def joined(
      points: DataFrame,
      intervals: DataFrame,
      pos: String,
      start: String,
      stop: String,
      keys: Seq[String] = Nil,
      binWidth: Long = 1000000L): DataFrame = {
    val w = lit(binWidth)
    val ivBinned = intervals.withColumn(
      "__bin",
      explode(sequence(floor(col(start) / w).cast("long"),
                       floor(col(stop) / w).cast("long"))))
    val ptBinned = points.withColumn("__bin", floor(col(pos) / w).cast("long"))
    val joinCond = (keys :+ "__bin")
      .map(k => ptBinned(k) === ivBinned(k))
      .reduce(_ && _) && ivBinned(start) <= ptBinned(pos) && ptBinned(pos) <= ivBinned(stop)
    val raw = ptBinned.join(ivBinned, joinCond, "inner")
    val dupCols: Seq[Column] =
      Seq(ivBinned("__bin"), ptBinned("__bin")) ++ keys.map(ivBinned(_))
    dupCols.foldLeft(raw)(_ drop _)
  }
}
