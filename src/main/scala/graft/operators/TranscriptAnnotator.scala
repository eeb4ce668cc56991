package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DnaOps
import org.apache.spark.unsafe.types.UTF8String

/** The reference's core module — VariantPostProcessing.java:168-668 — as a
  * composed Spark pipeline: map every variant onto every transcript of
  * every gene whose range contains it, name the transcript location
  * (EXON / INTRON / UTR / NON-CODING), flag near-splice-site variants,
  * and for coding exonic variants rebuild the UTR-trimmed CDS, apply the
  * variant (SNV, insertion, deletion or MNV — the branch ladder at
  * VariantPostProcessing.java:472-492), translate both strands and call
  * the AA change, synonymous status and frameshift.
  *
  * Spark shape vs the reference's: GeneCache/TranscriptCache HashMaps →
  * joins (the gene containment via [[RangeJoin]]'s binned equi-join);
  * per-variant cursor loop → one narrow pass after a per-(variant,
  * transcript) aggregation; chromosome FASTA file reads → a pluggable
  * [[GenomeSource]] evaluated inside the final distributed map (real
  * deployments back it with a broadcast FASTA index, see
  * [[graft.sources.FastaGenome]]; tests use [[FixedGenome]]; the
  * synthetic default [[Md5Genome]] is deterministic AND reproducible in
  * SQL, so the full pipeline has a DuckDB oracle).
  */
object TranscriptAnnotator {

  /** 1-based inclusive genomic sequence access. */
  trait GenomeSource extends Serializable {
    def chunk(chr: String, start: Long, stopInclusive: Long): String
  }

  /** In-memory genome for tests / small references. */
  case class FixedGenome(chrs: Map[String, String]) extends GenomeSource {
    def chunk(chr: String, start: Long, stop: Long): String = {
      val s = chrs.getOrElse(chr, "")
      if (s.isEmpty) "" else s.substring(
        math.max(0, (start - 1).toInt), math.min(s.length, stop.toInt))
    }
  }

  /** Deterministic synthetic genome: base at (chr,pos) from a mixed hash. */
  case class HashGenome() extends GenomeSource {
    private val bases = "ACGT"
    def chunk(chr: String, start: Long, stop: Long): String = {
      val sb = new java.lang.StringBuilder((stop - start + 1).toInt)
      var p = start
      val ch = chr.hashCode.toLong
      while (p <= stop) {
        var h = p * 0x9E3779B97F4A7C15L + ch * 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 29; h *= 0xBF58476D1CE4E5B9L; h ^= h >>> 32
        sb.append(bases.charAt((h & 3).toInt))
        p += 1
      }
      sb.toString
    }
  }

  /** md5-derived genome: the base at (chr,pos) is the first hex nibble of
    * md5("chr:pos") mapped through "ACGTACGTACGTACGT" — i.e. exactly
    * DuckDB's `translate(substr(md5(chr||':'||pos),1,1),
    * '0123456789abcdef','ACGTACGTACGTACGT')`, so an external SQL engine
    * can rebuild the identical genome and oracle-check the whole
    * annotation pipeline. */
  case class Md5Genome() extends GenomeSource {
    private val bases = "ACGTACGTACGTACGT"
    def chunk(chr: String, start: Long, stop: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val sb = new java.lang.StringBuilder((stop - start + 1).toInt)
      var p = start
      while (p <= stop) {
        val d = md.digest((chr + ":" + p).getBytes("UTF-8"))
        sb.append(bases.charAt((d(0) >> 4) & 0xf))
        p += 1
      }
      sb.toString
    }
  }

  /** One (variant, transcript) pair ready for the CDS step. */
  case class VarTr(
      var_id: Long, chr: String, pos: Long, var_stop: Long,
      ref_nuc: String, var_nuc: String,
      tr_id: Long, strand: String, non_coding: Boolean,
      in_exon: Boolean, in_u3: Boolean, in_u5: Boolean, near_splice: Boolean,
      exons: Seq[ExonIv])
  case class ExonIv(start: Long, stop: Long)

  /** Output row — the VARIANT_TRANSCRIPT analog (natural variant key
    * carried through so results are joinable/verifiable without var_id).
    * `full_ref_nuc` / `full_ref_nuc_pos` are the stored-CDS columns of the
    * reference's VARIANT_TRANSCRIPT table (strand-adjusted untrimmed CDS
    * and the variant's 1-based position within it) — populated only on
    * rows that reached an AA call, which is exactly the
    * `syn_status IS NOT NULL` set the post-hoc verifyAA audit
    * (VariantPostProcessing.java:1067-1280) re-derives codons from. */
  case class Annotated(
      var_id: Long, chr: String, pos: Long, ref_nuc: String, var_nuc: String,
      tr_id: Long, location: String, near_splice_site: String,
      syn_status: Option[String], ref_aa: Option[String],
      var_aa: Option[String], aa_pos: Option[Int], triplet_error: String,
      frame_shift: Option[String],
      full_ref_nuc: Option[String] = None,
      full_ref_nuc_pos: Option[Int] = None)

  /** '-' and null normalize to the empty sequence (the reference uses
    * both conventions for ins/del alleles). */
  private def normSeq(s: String): String =
    if (s == null || s == "-") "" else s

  /** endPos semantics from VariantLoad3.java:299-315: snv/mnv → pos+1,
    * insertion (empty ref) → pos, deletion (empty var) → pos+len(ref). */
  private def varStopCol(pos: Column, refNuc: Column, varNuc: Column): Column = {
    val refLen = when(refNuc.isNull || refNuc === "" || refNuc === "-", lit(0L))
      .otherwise(length(refNuc).cast("long"))
    val varLen = when(varNuc.isNull || varNuc === "" || varNuc === "-", lit(0L))
      .otherwise(length(varNuc).cast("long"))
    when(refLen > 0 && varLen > 0, pos + 1)
      .when(refLen === 0, pos)
      .otherwise(pos + refLen)
  }

  /** @param variants    var_id, chr, pos, ref_nuc, var_nuc ('' or '-' for
    *                    the empty side of an ins/del)
    * @param genes       gene_id, chr, gstart, gstop
    * @param transcripts tr_id, gene_id, strand ('+'/'-'), non_coding
    * @param features    tr_id, ftype ('EXONS'|'3UTRS'|'5UTRS'), fstart, fstop
    */
  def annotate(variants: DataFrame, genes: DataFrame, transcripts: DataFrame,
               features: DataFrame, genome: GenomeSource,
               binWidth: Long = 1 << 20): Dataset[Annotated] = {
    val spark = variants.sparkSession
    import spark.implicits._

    // variant ∈ gene range (binned equi-join), then fan out to transcripts
    val vg = RangeJoin.joined(
      variants.select(col("var_id"), col("chr"), col("pos"),
        col("ref_nuc"), col("var_nuc"),
        varStopCol(col("pos"), col("ref_nuc"), col("var_nuc")).as("var_stop")),
      genes.select("gene_id", "chr", "gstart", "gstop"),
      "pos", "gstart", "gstop", keys = Seq("chr"), binWidth = binWidth)
    val vt = vg.join(transcripts, "gene_id")
      .select("var_id", "chr", "pos", "var_stop", "ref_nuc", "var_nuc",
        "tr_id", "strand", "non_coding")

    // exon ordering within each transcript (for the terminal-exon rules)
    val w = Window.partitionBy("tr_id").orderBy("fstart")
    val wAll = Window.partitionBy("tr_id")
    val ex = features.filter(col("ftype") === "EXONS")
      .withColumn("exon_idx", row_number().over(w))
      .withColumn("n_exons", count(lit(1)).over(wAll))
    // at most one UTR of each kind per transcript (reference assumption)
    val utrs = features.filter(col("ftype").isin("3UTRS", "5UTRS"))
      .groupBy("tr_id")
      .agg(min(when(col("ftype") === "3UTRS", col("fstart"))).as("u3s"),
        min(when(col("ftype") === "3UTRS", col("fstop"))).as("u3e"),
        min(when(col("ftype") === "5UTRS", col("fstart"))).as("u5s"),
        min(when(col("ftype") === "5UTRS", col("fstop"))).as("u5e"))

    // LEFT join: a transcript with no EXONS features still yields a row
    // (the reference emits an INTRON VARIANT_TRANSCRIPT for those —
    // VariantPostProcessing.processChromosome "not found means INTRON")
    val vtf = vt.join(ex, Seq("tr_id"), "left").join(utrs, Seq("tr_id"), "left")

    // on '-' strand the 3' and 5' UTRs swap roles before exon trimming
    // (VariantPostProcessing.java:405-412)
    val minus = col("strand") === "-"
    val e3s = when(minus, col("u5s")).otherwise(col("u3s"))
    val e5e = when(minus, col("u3e")).otherwise(col("u5e"))

    // handleUTRs (VariantPostProcessing.java:626-668): trim each exon
    // against the 3'UTR tail and 5'UTR head; fully-covered exons drop
    val afters3 =
      when(e3s.isNull || col("fstop") < e3s, col("fstop"))
        .when(col("fstart") < e3s, e3s - 1)
        .otherwise(lit(null))
    val after5s =
      when(e5e.isNull || col("fstart") > e5e, col("fstart"))
        .when(col("fstop") > e5e, e5e + 1)
        .otherwise(lit(null))

    // per-exon-row flags against the variant [pos, var_stop]
    val varStop = col("var_stop")
    val containsVar = col("fstart") <= col("pos") && col("fstop") >= varStop
    val nearStart = col("exon_idx") =!= 1 &&
      col("fstart") - 10 <= col("pos") && col("fstart") + 10 >= varStop
    val nearStop = col("exon_idx") =!= col("n_exons") &&
      col("fstop") - 10 <= col("pos") && col("fstop") + 10 >= varStop

    // ONE exchange for both the aggregation and the CDS-cache
    // co-location: hash(tr_id) partitioning satisfies the groupBy's
    // ClusteredDistribution(var_id, tr_id) (a subset of the grouping
    // keys co-locates every group), so the aggregate plans with no
    // second exchange and the mapPartitions below inherits tr_id
    // co-location directly — the previous shape exchanged the
    // annotation stream twice (hash(var_id, tr_id) for the aggregate,
    // then hash(tr_id) for the cache), guide §2.4.
    val grouped = vtf
      .withColumn("t_start", after5s)
      .withColumn("t_stop", afters3)
      .repartition(col("tr_id"))
      .groupBy("var_id", "tr_id")
      .agg(
        first("chr").as("chr"), first("pos").as("pos"),
        first("var_stop").as("var_stop"),
        first("ref_nuc").as("ref_nuc"), first("var_nuc").as("var_nuc"),
        first("strand").as("strand"), first("non_coding").as("non_coding"),
        coalesce(max(containsVar), lit(false)).as("in_exon"),
        max(coalesce(col("u3s") <= col("pos") && col("u3e") >= varStop,
          lit(false))).as("in_u3"),
        max(coalesce(col("u5s") <= col("pos") && col("u5e") >= varStop,
          lit(false))).as("in_u5"),
        coalesce(max(nearStart || nearStop), lit(false)).as("near_splice"),
        sort_array(collect_list(when(
          col("t_start").isNotNull && col("t_stop").isNotNull &&
            col("t_start") <= col("t_stop"),
          struct(col("t_start").as("start"), col("t_stop").as("stop")))))
          .as("exons"))

    val g = genome
    // rows of the same transcript are already co-located (the
    // repartition above), so the per-partition CDS cache rebuilds each
    // transcript's reference sequence once, not per variant
    grouped.as[VarTr].mapPartitions { it =>
      val cdsCache = scala.collection.mutable.HashMap.empty[Long, String]
      it.map(annotateOne(_, g, cdsCache))
    }
  }

  /** `--verifyIfInRgd` (the EVA runs, postProcessingEva.sh): drop
    * annotations whose (variant, transcript) pair is already loaded —
    * the reference preloads VARIANT_TRANSCRIPT into a HashMap and skips
    * matches (VariantTranscriptBatch.preloadVariantTranscriptData); here
    * it is a left-anti join on the pair key, shuffle-partitioned on both
    * sides at scale. `existing` needs var_id + tr_id columns. */
  def verifyIfInRgd(annotated: Dataset[Annotated],
                    existing: DataFrame): Dataset[Annotated] = {
    val spark = annotated.sparkSession
    import spark.implicits._
    annotated.toDF()
      .join(existing.select("var_id", "tr_id"), Seq("var_id", "tr_id"),
        "left_anti")
      .as[Annotated]
  }

  /** The per-(variant, transcript) core — processTranscript +
    * handleTranslatedProtein (VariantPostProcessing.java:402-624).
    * `cdsCache` memoizes the reference CDS per transcript (the trimmed
    * exon list is variant-independent). */
  private def annotateOne(v: VarTr, genome: GenomeSource,
      cdsCache: scala.collection.mutable.HashMap[Long, String]): Annotated = {
    val parts = Seq(
      if (v.in_u3) Some("3UTRS") else None,
      if (v.in_u5) Some("5UTRS") else None,
      if (v.in_exon) Some("EXON") else None).flatten
    val nearSplice = if (v.near_splice) "T" else "F"
    // NON-CODING is appended whenever the transcript is non-coding,
    // regardless of inExon (VariantPostProcessing.java:274-283)
    val ncSuffix = if (v.non_coding) Seq("NON-CODING") else Nil

    def locationOnly(extra: Seq[String], tripletError: String = "F") =
      Annotated(v.var_id, v.chr, v.pos, v.ref_nuc, v.var_nuc, v.tr_id,
        (parts ++ extra).mkString(","), nearSplice,
        None, None, None, None, tripletError, None)

    if (!v.in_exon) return locationOnly(Seq("INTRON") ++ ncSuffix)
    if (v.non_coding) return locationOnly(ncSuffix)

    val refSeq = normSeq(v.ref_nuc)
    val varSeq = normSeq(v.var_nuc)

    // locate the containing trimmed exon: start <= pos && stop > varStop
    // (strict, VariantPostProcessing.java:431), accumulating the relative
    // position over the preceding kept exons
    var relPos = 0L
    var found = false
    val it = v.exons.iterator
    while (it.hasNext && !found) {
      val e = it.next()
      if (e.start <= v.pos && e.stop > v.var_stop) {
        relPos += v.pos - (e.start - 1)
        found = true
      } else relPos += e.stop - e.start + 1
    }
    if (!found) return locationOnly(Nil)

    var refDna = cdsCache.getOrElseUpdate(v.tr_id,
      v.exons.map(e => genome.chunk(v.chr, e.start, e.stop))
        .mkString.toLowerCase)
    val rp = relPos.toInt
    // invariant: relPos is bounded by the CDS length when var_id is unique
    // per (chr,pos,ref,var); duplicate variant ids would merge two exon
    // lists in the groupBy above and corrupt the relative position.
    // Quarantine the row (one malformed gene model must not kill a
    // 100 TB job) — counted downstream via location='ERROR'.
    if (rp < 1 || rp > refDna.length)
      return Annotated(v.var_id, v.chr, v.pos, v.ref_nuc, v.var_nuc, v.tr_id,
        "ERROR", nearSplice, None, None, None, None, "T", None)

    // apply the variant — the branch ladder of
    // VariantPostProcessing.java:472-492 (deletion / insertion /
    // anchored insertion / complex / snv)
    val sb = new java.lang.StringBuilder(refDna)
    if (v.var_nuc == null || v.var_nuc.isEmpty || v.var_nuc.contains("-")) {
      // deletion — VariantPostProcessing.java:473-479: the deleted span is
      // len(var_nuc) for dash-denoted alleles ('-'→1, '---'→3) and 1 when
      // the allele is null/empty; NOT len(ref). For ref='ACG', var='-'
      // the reference removes ONE base — faithful even though the ref
      // allele says three (fidelity over biology, like the MNV branch).
      val delLen =
        if (v.var_nuc == null || v.var_nuc.isEmpty) 1 else v.var_nuc.length
      sb.delete(rp - 1, math.min(sb.length, rp - 1 + delLen))
    } else if (refSeq.isEmpty) {
      sb.insert(rp - 1, varSeq.toLowerCase)
    } else if (refSeq.length == 1 && varSeq.length > 1) {
      sb.insert(rp, varSeq.substring(1).toLowerCase)
    } else if (refSeq.length != 1 || varSeq.length != 1) {
      // MNV/complex — faithful to the reference's endPos formula: var_stop
      // is pos+1 for any both-alleles-non-empty variant, so the replace
      // consumes delLen = 1 ref base even for a length-preserving MNV
      // (AT→GC yields a stray ref base and frame_shift='T'). This is the
      // reference's arithmetic (VariantPostProcessing.java:487-490 with
      // VariantLoad3.java:299-303), reproduced verbatim — biologically
      // questionable, deliberately not "fixed" so outputs stay comparable.
      val delLen = (v.var_stop - v.pos).toInt
      sb.replace(rp - 1, math.min(sb.length, rp - 1 + delLen),
        varSeq.toLowerCase)
    } else {
      sb.setCharAt(rp - 1, Character.toLowerCase(varSeq.charAt(0)))
    }
    var varDna = sb.toString

    var relP = rp
    if (v.strand == "-") {
      relP = refDna.length - relP + 1
      refDna = DnaOps.reverseComplement(UTF8String.fromString(refDna))
        .toString.toLowerCase
      varDna = DnaOps.reverseComplement(UTF8String.fromString(varDna))
        .toString.toLowerCase
    }

    val tripletError = if (refDna.length % 3 != 0) "T" else "F"
    val refTrim = refDna.substring(0, refDna.length - refDna.length % 3)
    val varTrim = varDna.substring(0, varDna.length - varDna.length % 3)
    if (relP < 1) return locationOnly(Nil, tripletError)

    val refAaSeq = DnaOps.translate(UTF8String.fromString(refTrim)).toString
    val varAaSeq = DnaOps.translate(UTF8String.fromString(varTrim)).toString
    val aaPos = 1 + (relP - 1) / 3
    if (aaPos < 1 || aaPos > refAaSeq.length || aaPos > varAaSeq.length)
      return locationOnly(Nil, tripletError)

    val refAa = refAaSeq.substring(aaPos - 1, aaPos)
    val varAa = varAaSeq.substring(aaPos - 1, aaPos)
    val syn =
      if (refAa == "X" || varAa == "X") "unassignable"
      else if (refAa == varAa) "synonymous"
      else "nonsynonymous"
    val frameShift =
      if (math.abs(refTrim.length - varTrim.length) % 3 != 0) "T" else "F"

    Annotated(v.var_id, v.chr, v.pos, v.ref_nuc, v.var_nuc, v.tr_id,
      parts.mkString(","), nearSplice,
      Some(syn), Some(refAa), Some(varAa), Some(aaPos), tripletError,
      Some(frameShift),
      Some(refDna.toUpperCase), Some(relP))
  }
}
