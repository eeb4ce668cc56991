package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}

/** BED interval source — the standard region-list format (capture
  * targets, blacklists, conservation regions).
  *
  * BED is 0-based half-open; everything in this library (the reference's
  * coordinates, [[graft.operators.RangeJoin]], the annotator) is 1-based
  * inclusive, so `start` gains 1 and `stop` stays — the classic
  * off-by-one this source exists to centralize. Browser lines, comments
  * and track headers are skipped. One narrow parse, no shuffle.
  */
object Bed {

  case class Interval(chr: String, start: Long, stop: Long, name: String)

  private[sources] def parseLine(
      line: String, accessionMap: Map[String, String]): Option[Interval] = {
    val t = line.trim
    if (t.isEmpty || t.startsWith("#") || t.startsWith("track") ||
      t.startsWith("browser")) return None
    val v = t.split("\t", -1)
    if (v.length < 3) return None
    // same chromosome naming as the variant path (chr-strip, M→MT,
    // NC_ accessions) so interval joins line up — Gff3.normChr
    val chr = Gff3.normChr(v(0), accessionMap)
    try Some(Interval(chr, v(1).toLong + 1, v(2).toLong,
      if (v.length > 3) v(3) else ""))
    catch { case _: NumberFormatException => None }
  }

  /** BED text → 1-based inclusive intervals (chr, start, stop, name). */
  def parse(lines: Dataset[String],
            accessionMap: Map[String, String] = Map.empty): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val accMap = accessionMap
    lines.flatMap(parseLine(_, accMap)).toDF()
  }
}
