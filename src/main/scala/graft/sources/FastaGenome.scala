package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.operators.TranscriptAnnotator.GenomeSource

/** FASTA-backed [[GenomeSource]] — the reference reads per-chromosome
  * `chr<N>.fa.gz` files through a memory-mapped `.nuc` cache
  * (ChrFastaFile.java:20-104: concatenate non-header non-empty lines).
  *
  * Spark shape: parse the FASTA once, broadcast the chromosome map, and
  * let every executor slice locally — the distributed analog of the
  * reference's one mmap per JVM. Suitable for references that fit in
  * executor memory (a mammalian genome is ~3 GB — fine on cluster-sized
  * executors; a 2bit-packed variant would quarter that if needed).
  */
object FastaGenome {

  /** Parse FASTA text into chromosome → sequence. Header names take the
    * first word after '>' and drop a leading "chr" (the reference's file
    * naming tolerates chr/Chr/ch/c prefixes — ChrFastaFile.java:49). */
  def parse(lines: Iterator[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, java.lang.StringBuilder]
    var cur: java.lang.StringBuilder = null
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty) {
        if (line.charAt(0) == '>') {
          var name = line.substring(1).split("\\s+")(0)
          if (name.length > 3 && name.substring(0, 3).equalsIgnoreCase("chr"))
            name = name.substring(3)
          cur = new java.lang.StringBuilder
          out(name) = cur
        } else if (cur != null) cur.append(line)
      }
    }
    out.iterator.map { case (k, v) => k -> v.toString }.toMap
  }

  /** Default cap on driver-side genome materialization: 8 G bases covers
    * any vertebrate reference (human ~3.1 G) with headroom; past that the
    * broadcast-map design itself is wrong, not just the collect. */
  val DefaultMaxBases: Long = 8L << 30

  /** Driver-side load + broadcast. FASTA files are header-delimited, so
    * the per-chromosome grouping must see lines in order — this streams
    * the text through the driver once (`toLocalIterator`, one partition
    * in memory at a time, but the PARSED genome accumulates fully on the
    * driver), like the reference's one-time `.nuc` conversion.
    *
    * Memory bound: driver and every executor hold one copy of the genome
    * (~1 byte/base + per-chromosome StringBuilder overhead during parse).
    * That is the deliberate design point for reference genomes (≤ a few
    * GB); it is NOT a general FASTA ingestion path. `maxBases` fails fast
    * with a clear message instead of an eventual driver OOM when fed
    * something bigger (a metagenome, a concatenated corpus). */
  def fromLines(spark: SparkSession, lines: Dataset[String],
                maxBases: Long = DefaultMaxBases): BroadcastGenome =
    BroadcastGenome(spark.sparkContext.broadcast(
      parse(guardedIterator(lines, maxBases))))

  /** Driver-side line stream with the `maxBases` fail-fast guard —
    * shared with [[PackedGenome.fromLines]], which packs the parsed map
    * before broadcasting anything. */
  private[sources] def guardedIterator(lines: Dataset[String],
                                       maxBases: Long): Iterator[String] = {
    var total = 0L
    lines.toLocalIterator().asScala.map { l =>
      if (l.nonEmpty && l.charAt(0) != '>') {
        total += l.length
        if (total > maxBases) throw new IllegalArgumentException(
          s"FASTA exceeds maxBases=$maxBases; a genome this large cannot " +
            "be driver-materialized and broadcast - shard it or raise the " +
            "cap explicitly if the driver/executors have the memory")
      }
      l
    }
  }

  def fromText(spark: SparkSession, text: String): BroadcastGenome =
    BroadcastGenome(spark.sparkContext.broadcast(
      parse(text.linesIterator)))

  private implicit class IterAsScala[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** 1-based inclusive slicing over the broadcast map. Out-of-range
    * requests clamp to the chromosome (empty result past the end) —
    * same behavior as [[PackedGenome]], so genome sources are
    * interchangeable even on malformed gene models. */
  case class BroadcastGenome(bc: Broadcast[Map[String, String]])
      extends GenomeSource {
    def chunk(chr: String, start: Long, stop: Long): String = {
      val s = bc.value.getOrElse(chr, "")
      val b = math.min(s.length, math.max(0, (start - 1).toInt))
      val e = math.min(s.length, math.max(0L, stop).toInt)
      if (e <= b) "" else s.substring(b, e)
    }
  }
}
