package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed VCF → "common format 2" conversion.
  *
  * Re-expresses VcfToCommonFormat2Converter.java:109-357: skip headers,
  * read the #CHROM header for strain names, then for each data line ×
  * strain × non-ref allele emit one flat row with ACGT read counts from
  * the AD field, total depth from DP, rsId / RGD id parsing.
  *
  * The reference streams one file through one JVM and keeps one output
  * file per strain. Here the whole VCF is a line Dataset: header
  * discovery is a tiny driver-side read of the first non-## line, and the
  * per-line fan-out (strains × alleles) is a pair of lateral explodes that
  * whole-stage-codegen compiles into one narrow pass — shuffle-free,
  * scaling to any number of files × strains.
  */
object VcfParser {

  /** Column layout of common format 2 (README "Common Format 2"). */
  val outputColumns: Seq[String] = Seq(
    "strain", "chr", "pos", "ref_nuc", "var_nuc", "rs_id",
    "count_a", "count_c", "count_g", "count_t", "total_depth",
    "hgvs_name", "rgd_id", "allele_count", "allele_depth", "read_depth")

  /** One emitted common-format-2 row. */
  case class Cf2Row(strain: String, chr: String, pos: Int, ref_nuc: String,
                    var_nuc: String, rs_id: String, count_a: Int, count_c: Int,
                    count_g: Int, count_t: Int, total_depth: Int,
                    hgvs_name: Option[String], rgd_id: Option[Int],
                    allele_count: Int, allele_depth: Int, read_depth: Int)

  /** Parse VCF text lines. `strainNames` are the sample columns from the
    * #CHROM header (column 10 onward); pass what `headerStrains` returns.
    *
    * Implemented as a single imperative pass per partition (the same shape
    * as Spark's own text-format datasources): a first declarative draft
    * re-evaluated the split/transform expression trees once per derived
    * column after projection collapse — ~10x the work. One hand-rolled
    * pass keeps the whole parse narrow, shuffle-free and allocation-light.
    *
    * @param processVariantsSameAsRef also emit alleles equal to the ref
    *        (default false, like the reference)
    * @param processLinesWithMissingADDP keep lines whose FORMAT lacks
    *        AD/DP, substituting depth 9 (the reference's `--ADDP` option,
    *        VcfToCommonFormat2Converter.java:192-273); default false =
    *        drop such lines
    * @param accessionMap NC_* accession → chromosome name (the reference
    *        resolves these from its MapDAO; pass the equivalent lookup)
    */
  def parse(lines: Dataset[String], strainNames: Seq[String],
            processVariantsSameAsRef: Boolean = false,
            processLinesWithMissingADDP: Boolean = false,
            accessionMap: Map[String, String] = Map.empty): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val strains = strainNames.toArray
    val sameAsRef = processVariantsSameAsRef
    val missingADDP = processLinesWithMissingADDP
    val accMap = accessionMap
    lines.mapPartitions { it =>
      it.flatMap(parseLine(_, strains, sameAsRef, missingADDP, accMap))
    }.toDF().select(outputColumns.map(col): _*)
  }

  private def toIntOpt(s: String): Option[Int] =
    try Some(s.toInt) catch { case _: NumberFormatException => None }

  /** Chromosome normalization — VcfToCommonFormat2Base.getChromosome:
    * NC_* accessions resolve through the provided map; otherwise every
    * "chr" and "c" substring is stripped (the reference's exact
    * `replace` calls), names longer than 2 chars / containing 'r' /
    * equal to "Un" are rejected, and "M" maps to "MT". */
  private[graft] def normalizeChr(
      raw: String, accessionMap: Map[String, String]): Option[String] = {
    val impl =
      if (raw.startsWith("NC_")) accessionMap.get(raw)
      else {
        val c = raw.replace("chr", "").replace("c", "")
        if (c.isEmpty || c.length > 2 || c.contains("r") || c == "Un") None
        else Some(c)
      }
    impl.map(c => if (c == "M") "MT" else c)
  }

  /** A data line that passed every line-level gate of the converter's
    * processLine (VcfToCommonFormat2Converter.java:160-198): not a
    * header, ≥10 columns, valid chromosome, parseable position, single
    * ALT allele, AD/DP present in FORMAT unless `--ADDP`. */
  private[graft] final case class GatedLine(
      v: Array[String], chr: String, pos: Int, adIdx: Int, dpIdx: Int)

  /** The shared line-level gate — used by both the variant parse and the
    * genotype tally so the two can't drift. */
  private[graft] def gateLine(line: String, missingADDP: Boolean,
      accessionMap: Map[String, String]): Option[GatedLine] = {
    if (line.isEmpty || line.charAt(0) == '#') return None
    val v = line.split("\t", -1)
    if (v.length < 10) return None
    val chr = normalizeChr(v(0), accessionMap).getOrElse(return None)
    val pos = toIntOpt(v(1)).getOrElse(return None)
    if (v(4).contains(',')) return None // multi-allelic: skipped
    val format = if (v(8).contains(";")) v(8).split(";") else v(8).split(":")
    var adIdx = format.indexOf("AD")
    if (adIdx < 0) adIdx = format.indexOf("CLCAD2")
    val dpIdx = format.indexOf("DP")
    if ((adIdx < 0 || dpIdx < 0) && !missingADDP) return None
    Some(GatedLine(v, chr, pos, adIdx, dpIdx))
  }

  /** Genotype string of one sample cell — the first 3 chars ('0/1' of
    * '0/1:470,63:533'), or the whole cell when shorter
    * (VcfToCommonFormat2Converter.java:227-235). */
  private def genotypeOf(data: String): String =
    if (data.length >= 3) data.substring(0, 3) else data

  /** One (strain, genotype) tally per sample cell of a gated line —
    * shared by the single-header and per-file tally paths so the two
    * cannot drift. */
  private def tallyCells(g: GatedLine,
                         strains: Array[String]): Iterator[(String, String)] = {
    val n = math.min(strains.length, g.v.length - 9)
    (0 until n).iterator.map(si => (strains(si), genotypeOf(g.v(9 + si))))
  }

  /** Reference behavior: VcfToCommonFormat2Converter.processLine /
    * processStrain (lines 161-318). */
  private[graft] def parseLine(line: String, strains: Array[String],
                                   sameAsRef: Boolean,
                                   missingADDP: Boolean = false,
                                   accessionMap: Map[String, String] = Map.empty): Iterator[Cf2Row] = {
    val gated = gateLine(line, missingADDP, accessionMap)
      .getOrElse(return Iterator.empty)
    val v = gated.v
    val chr = gated.chr
    val pos = gated.pos
    val adIdx = gated.adIdx
    val dpIdx = gated.dpIdx
    val id = v(2)
    val refNuc = v(3)
    val alt = v(4)

    // ClinVar-style ID field: RGDID:<id>;<hgvs>
    var rgdId: Option[Int] = None
    var hgvs: Option[String] = None
    if (id.startsWith("RGDID:")) {
      val semi = id.indexOf(';')
      if (semi > 0) {
        rgdId = toIntOpt(id.substring(6, semi))
        hgvs = Some(id.substring(semi + 1))
      }
    }

    val alleles = Array(refNuc, alt)
    val alleleCount = 1 // single ALT per line (multi-allelic skipped above)

    val nStrains = math.min(strains.length, v.length - 9)
    (0 until nStrains).iterator.flatMap { si =>
      val data = v(9 + si)
      val gt = genotypeOf(data)
      if (gt == "./." || gt == "." || gt == "0/0" || gt == "0") Iterator.empty
      else {
        val fields = data.split(":")
        if ((adIdx >= fields.length && adIdx >= 0) ||
            (dpIdx >= fields.length && dpIdx >= 0)) Iterator.empty
        else {
          // AD missing + --ADDP: substitute depth 9 for every allele slot
          // (VcfToCommonFormat2Converter.java:254-258)
          val counts: Array[Int] =
            if (adIdx < 0) Array.fill(8)(9)
            else {
              val adRaw = fields(adIdx)
              if (adRaw == ".") Array(0)
              else adRaw.split(",").map(s => toIntOpt(s).getOrElse(0))
            }
          var readDepth = 0
          var i = 0
          while (i < counts.length) { readDepth += counts(i); i += 1 }
          if (adIdx < 0) readDepth = 9
          val totalDepth =
            if (dpIdx < 0) 9
            else {
              val dpRaw = fields(dpIdx)
              if (dpRaw == ".") 0 else toIntOpt(dpRaw).getOrElse(0)
            }

          def countFor(nuc: String): Int = {
            val ai = alleles.indexOf(nuc)
            if (ai >= 0 && ai < counts.length) counts(ai) else 0
          }

          alleles.iterator
            .filter(a => sameAsRef || a != refNuc)
            .map { allele =>
              Cf2Row(strains(si), chr, pos, refNuc, allele, id,
                countFor("A"), countFor("C"), countFor("G"), countFor("T"),
                totalDepth, hgvs, rgdId, alleleCount, countFor(allele), readDepth)
            }
        }
      }
    }
  }

  /** Per-(strain, genotype) tallies — the converter's per-strain
    * genotypeCountMaps (VcfToCommonFormat2Converter.java:377-391
    * `handleGenotype`; same map in convert/RatMcwVCF.java:20-41). Every
    * sample cell of every line passing the line-level gate tallies its
    * genotype string — INCLUDING './.' and '0/0', which are counted
    * before being skipped for variant emission. The reference keeps one
    * in-memory HashMap per strain and dumps it at end-of-run; here the
    * tally is a map-side-combined groupBy, so only (strain, genotype, n)
    * partials shuffle regardless of input size. */
  def genotypeCounts(lines: Dataset[String], strainNames: Seq[String],
                     processLinesWithMissingADDP: Boolean = false,
                     accessionMap: Map[String, String] = Map.empty): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val strains = strainNames.toArray
    val missingADDP = processLinesWithMissingADDP
    val accMap = accessionMap
    lines.mapPartitions { it =>
      it.flatMap { line =>
        gateLine(line, missingADDP, accMap) match {
          case None => Iterator.empty
          case Some(g) => tallyCells(g, strains)
        }
      }
    }.toDF("strain", "genotype")
      .groupBy("strain", "genotype").agg(count(lit(1)).as("n"))
  }

  /** Parse 8-column (sample-less) VCF — Vcf8ColToCommonFormat2Converter:
    * depths come from the INFO field (DP total, AC per ALT allele), the
    * reference allele's depth is imputed as DP − ΣAC when the ref is not
    * among the alleles, and one row is emitted per non-ref allele
    * (multi-allelic ALT lists allowed, unlike the sample'd format). */
  def parse8Col(lines: Dataset[String],
                processVariantsSameAsRef: Boolean = false,
                accessionMap: Map[String, String] = Map.empty): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val sameAsRef = processVariantsSameAsRef
    val accMap = accessionMap
    lines.mapPartitions(_.flatMap(parse8ColLine(_, sameAsRef, accMap)))
      .toDF().select(outputColumns.map(col): _*)
  }

  private[operators] def parse8ColLine(line: String, sameAsRef: Boolean,
      accessionMap: Map[String, String] = Map.empty): Iterator[Cf2Row] = {
    if (line.isEmpty || line.charAt(0) == '#') return Iterator.empty
    val v = line.split("\t", -1)
    if (v.length < 8) return Iterator.empty

    // same NC_* accession resolution as the sample'd dialect — the
    // reference's shared VcfToCommonFormat2Base.getChromosome
    val chr = normalizeChr(v(0), accessionMap).getOrElse(return Iterator.empty)
    val pos = toIntOpt(v(1)).getOrElse(return Iterator.empty)
    val rsId = v(2)
    val refNuc = v(3)

    val info = v(7).split(";", -1).iterator
      .map(f => (f, f.indexOf('=')))
      .collect { case (f, eq) if eq > 0 => f.substring(0, eq) -> f.substring(eq + 1) }
      .toMap
    val totalDepth = info.get("DP").flatMap(toIntOpt).getOrElse(return Iterator.empty)

    var alleles = v(4).split(",", -1)
    var depths: Array[Int] = info.get("AC") match {
      case Some(ac) => ac.split(",", -1).map(s => toIntOpt(s).getOrElse(0))
      case None     => null
    }
    // impute the reference allele's depth when absent from ALT
    if (depths != null && !alleles.contains(refNuc)) {
      val refDepth = totalDepth - depths.sum
      if (refDepth > 0) {
        alleles = alleles :+ refNuc
        depths = depths :+ refDepth
      }
    }
    val alleleCount = v(4).split(",", -1).length

    def depthOf(nuc: String): Int = {
      val i = alleles.indexOf(nuc)
      if (depths != null && i >= 0 && i < depths.length) depths(i) else 0
    }

    alleles.iterator.zipWithIndex
      .filter { case (a, _) => sameAsRef || a != refNuc }
      .map { case (allele, i) =>
        val (ca, cc, cg, ct, ad) =
          if (depths != null)
            (depthOf("A"), depthOf("C"), depthOf("G"), depthOf("T"),
              if (i < depths.length) depths(i) else 0)
          else (
            if (allele == "A") totalDepth else 0,
            if (allele == "C") totalDepth else 0,
            if (allele == "G") totalDepth else 0,
            if (allele == "T") totalDepth else 0,
            totalDepth)
        Cf2Row("", chr, pos, refNuc, allele, rsId, ca, cc, cg, ct,
          if (totalDepth > 0) totalDepth else 0, None, None,
          if (depths == null) 1 else alleleCount, ad,
          if (totalDepth > 0) totalDepth else 0)
      }
  }

  /** Strain names from the #CHROM header line (columns 10+).
    *
    * Single-header assumption: when `lines` spans several VCF files this
    * picks one arbitrary header and applies it positionally to every
    * file's sample columns — like the reference, which converts one file
    * per run. For multi-file loads with differing headers, parse per
    * file (key by `input_file_name()`) or pass explicit strain names. */
  def headerStrains(lines: Dataset[String]): Seq[String] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.filter(l => l.startsWith("#") && !l.startsWith("##"))
      .take(1).headOption
      .map(_.drop(1).split("\t", -1).drop(9).toSeq)
      .getOrElse(Nil)
  }

  /** Convenience: read VCF file(s) from a path. */
  def fromPath(spark: SparkSession, path: String,
               processVariantsSameAsRef: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
    parse(lines, headerStrains(lines), processVariantsSameAsRef)
  }

  /** (line, file) pairs plus the broadcast file → strain-columns map:
    * the header set is tiny (one line per file) — collected once and
    * broadcast; data lines never leave their partitions. */
  private def linesWithFileStrains(spark: SparkSession, path: String)
      : (Dataset[(String, String)], Broadcast[Map[String, Array[String]]]) = {
    import spark.implicits._
    val lines = spark.read.textFile(path)
      .select(col("value").as("line"),
        input_file_name().as("file"))
    val perFileStrains: Map[String, Array[String]] = lines
      .filter(col("line").startsWith("#") && !col("line").startsWith("##"))
      .as[(String, String)].collect()
      .map { case (hdr, file) =>
        file -> hdr.drop(1).split("\t", -1).drop(9)
      }.toMap
    (lines.as[(String, String)],
      spark.sparkContext.broadcast(perFileStrains))
  }

  /** Multi-file read with per-file headers: each file's #CHROM header
    * binds its own sample columns, so VCFs with different strain sets
    * load together correctly (the single-header `fromPath` applies one
    * header to every file). */
  def fromPathPerFile(spark: SparkSession, path: String,
                      processVariantsSameAsRef: Boolean = false,
                      processLinesWithMissingADDP: Boolean = false,
                      accessionMap: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val (lines, bc) = linesWithFileStrains(spark, path)
    val sameAsRef = processVariantsSameAsRef
    val missingADDP = processLinesWithMissingADDP
    val accMap = accessionMap
    lines.mapPartitions { it =>
      it.flatMap { case (line, file) =>
        parseLine(line, bc.value.getOrElse(file, Array.empty),
          sameAsRef, missingADDP, accMap)
      }
    }.toDF().select(outputColumns.map(col): _*)
  }

  /** Multi-file genotype tallies with per-file headers — the per-file
    * twin of [[genotypeCounts]], same shared line gate. */
  def genotypeCountsPerFile(spark: SparkSession, path: String,
                            processLinesWithMissingADDP: Boolean = false,
                            accessionMap: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val (lines, bc) = linesWithFileStrains(spark, path)
    val missingADDP = processLinesWithMissingADDP
    val accMap = accessionMap
    lines.mapPartitions { it =>
      it.flatMap { case (line, file) =>
        gateLine(line, missingADDP, accMap) match {
          case None => Iterator.empty
          case Some(g) => tallyCells(g, bc.value.getOrElse(file, Array.empty))
        }
      }
    }.toDF("strain", "genotype")
      .groupBy("strain", "genotype").agg(count(lit(1)).as("n"))
  }
}
