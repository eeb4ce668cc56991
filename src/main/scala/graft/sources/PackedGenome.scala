package graft.sources

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.operators.TranscriptAnnotator.GenomeSource

/** 2-bit packed [[GenomeSource]] — the memory-lean variant of
  * [[FastaGenome.BroadcastGenome]] for whole-genome broadcasts.
  *
  * A mammalian genome held as a JVM String costs ~1-2 bytes per base
  * per executor (3-6 GB); packing ACGT at 2 bits/base cuts that to
  * ~0.25 byte/base (~775 MB for human), the same layout as UCSC's .2bit.
  * Non-ACGT symbols (the long telomeric/centromeric N runs, IUPAC
  * codes) are range-encoded in a sorted exception table — real genomes
  * have few, long runs, so the table stays tiny — and resolved by
  * binary search at slice time.
  *
  * Bases are stored case-folded (like .2bit, which keeps case as a
  * separate mask); `chunk` returns uppercase. The transcript annotator
  * lowercases the rebuilt CDS itself, so annotation output is identical
  * to the string-backed genome.
  */
object PackedGenome {

  /** One packed chromosome: 2-bit codes + sorted non-ACGT runs. */
  final case class PackedChr(length: Int, packed: Array[Byte],
                             excStart: Array[Int], excEnd: Array[Int],
                             excChar: Array[Char]) extends Serializable

  private val code: Array[Byte] = {
    val a = Array.fill[Byte](128)(-1)
    a('A') = 0; a('C') = 1; a('G') = 2; a('T') = 3
    a('a') = 0; a('c') = 1; a('g') = 2; a('t') = 3
    a
  }
  private val bases = Array('A', 'C', 'G', 'T')

  private[sources] def packChr(seq: String): PackedChr = {
    val n = seq.length
    val packed = new Array[Byte]((n + 3) / 4)
    val es = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ee = scala.collection.mutable.ArrayBuffer.empty[Int]
    val ec = scala.collection.mutable.ArrayBuffer.empty[Char]
    var i = 0
    while (i < n) {
      val ch = seq.charAt(i)
      val c = if (ch < 128) code(ch) else -1
      if (c >= 0) {
        packed(i >> 2) = (packed(i >> 2) | (c << ((i & 3) << 1))).toByte
        i += 1
      } else {
        // open a run of this exception char (case-folded)
        val up = Character.toUpperCase(ch)
        val start = i
        while (i < n && Character.toUpperCase(seq.charAt(i)) == up &&
          (seq.charAt(i) >= 128 || code(seq.charAt(i)) < 0)) i += 1
        es += start; ee += i; ec += up
      }
    }
    PackedChr(n, packed, es.toArray, ee.toArray, ec.toArray)
  }

  private def charAt(p: PackedChr, i: Int): Char = {
    // binary search the exception runs: last run with start <= i
    var lo = 0; var hi = p.excStart.length - 1; var hit = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (p.excStart(mid) <= i) { hit = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (hit >= 0 && i < p.excEnd(hit)) p.excChar(hit)
    else bases((p.packed(i >> 2) >> ((i & 3) << 1)) & 3)
  }

  /** Packed genome map + 1-based inclusive slicing. */
  final case class Packed(bc: Broadcast[Map[String, PackedChr]])
      extends GenomeSource {
    def chunk(chr: String, start: Long, stop: Long): String = {
      val p = bc.value.getOrElse(chr, null)
      if (p == null) return ""
      val s = math.max(0, (start - 1).toInt)
      val e = math.min(p.length, stop.toInt)
      if (e <= s) return ""
      val sb = new java.lang.StringBuilder(e - s)
      var i = s
      while (i < e) { sb.append(charAt(p, i)); i += 1 }
      sb.toString
    }
  }

  /** Pack an in-memory chromosome map and broadcast it. */
  def fromChrs(spark: SparkSession, chrs: Map[String, String]): Packed =
    Packed(spark.sparkContext.broadcast(
      chrs.map { case (k, v) => k -> packChr(v) }))

  /** FASTA text → packed broadcast genome (same driver-side streaming
    * parse and `maxBases` guard as [[FastaGenome.fromLines]]); only the
    * packed map is ever broadcast — the unpacked strings stay a
    * transient driver-local value. */
  def fromLines(spark: SparkSession, lines: Dataset[String],
                maxBases: Long = FastaGenome.DefaultMaxBases): Packed =
    fromChrs(spark,
      FastaGenome.parse(FastaGenome.guardedIterator(lines, maxBases)))
}
