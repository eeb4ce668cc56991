package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** GFF3 gene-model source → the annotator's three model tables.
  *
  * The reference loads gene ranges and transcript features from its
  * database (GeneCache / TranscriptFeatureCache); a standalone library
  * needs a file format, and GFF3 is the standard interchange for gene
  * models. One narrow parse pass (9 tab-separated columns + key=value
  * attributes) feeds three projections:
  *
  *  - genes:       gene_id, chr, gstart, gstop           (type `gene`)
  *  - transcripts: tr_id, gene_id, strand, non_coding    (`mRNA` and
  *    friends; anything whose type is not in `codingTypes` is flagged
  *    non-coding, like the reference's NON-CODING transcripts)
  *  - features:    tr_id, ftype, fstart, fstop — `exon` → EXONS,
  *    `three_prime_UTR` → 3UTRS, `five_prime_UTR` → 5UTRS (the trimmed
  *    CDS is rebuilt by the annotator, so CDS rows are not needed)
  *
  * GFF3 ids are strings; the numeric ids the annotator joins on are
  * stable `xxhash64` hashes of them. Chromosome names drop a leading
  * "chr". Scales as a plain text scan — no driver state, no shuffle in
  * the parse itself.
  */
object Gff3 {

  case class ModelTables(genes: DataFrame, transcripts: DataFrame,
                         features: DataFrame)

  private val transcriptTypes = Set(
    "mRNA", "transcript", "lnc_RNA", "snoRNA", "snRNA", "rRNA", "tRNA",
    "miRNA", "ncRNA", "pseudogenic_transcript")
  private val codingTypes = Set("mRNA", "transcript")

  /** One parsed GFF3 row (attributes reduced to ID / one Parent; a
    * multi-parent feature — `Parent=t1,t2`, the GENCODE shared-exon
    * convention — emits one row per parent). */
  case class Row9(chr: String, ftype: String, start: Long, stop: Long,
                  strand: String, id: String, parent: String)

  /** Interval-source chromosome normalization: drop a leading "chr",
    * map mitochondrial "M" to "MT" and resolve NC_* accessions, matching
    * [[graft.operators.VcfParser]]'s variant chromosomes so joins line
    * up. Unlike the VCF gate, nothing is REJECTED here — interval lists
    * legitimately carry contigs the variant path filters out. */
  private[sources] def normChr(raw: String,
                               accessionMap: Map[String, String]): String = {
    if (raw.startsWith("NC_")) return accessionMap.getOrElse(raw, raw)
    val c = if (raw.startsWith("chr")) raw.substring(3) else raw
    if (c == "M") "MT" else c
  }

  private[sources] def parseLine(
      line: String, accessionMap: Map[String, String]): Iterator[Row9] = {
    if (line.isEmpty || line.charAt(0) == '#') return Iterator.empty
    val v = line.split("\t", -1)
    if (v.length < 9) return Iterator.empty
    val chr = normChr(v(0), accessionMap)
    val attrs = v(8).split(";").iterator
      .map(_.split("=", 2))
      .collect { case Array(k, value) => k -> value }
      .toMap
    val (start, stop) =
      try (v(3).toLong, v(4).toLong)
      catch { case _: NumberFormatException => return Iterator.empty }
    val id = attrs.getOrElse("ID", "")
    val parents = attrs.get("Parent") match {
      case Some(p) if p.nonEmpty => p.split(",").toSeq
      case _ => Seq("")
    }
    parents.iterator.map(p => Row9(chr, v(2), start, stop, v(6), id, p))
  }

  def parse(lines: Dataset[String],
            accessionMap: Map[String, String] = Map.empty): Dataset[Row9] = {
    val spark = lines.sparkSession
    import spark.implicits._
    val accMap = accessionMap
    lines.flatMap(parseLine(_, accMap))
  }

  /** Project the three annotator model tables out of a GFF3 text. */
  def modelTables(lines: Dataset[String],
                  accessionMap: Map[String, String] = Map.empty): ModelTables = {
    val rows = parse(lines, accessionMap).toDF()
    val genes = rows.filter(col("ftype") === "gene")
      .select(xxhash64(col("id")).as("gene_id"), col("chr"),
        col("start").as("gstart"), col("stop").as("gstop"))
    val transcripts = rows
      .filter(col("ftype").isin(transcriptTypes.toSeq: _*))
      .select(xxhash64(col("id")).as("tr_id"),
        xxhash64(col("parent")).as("gene_id"), col("strand"),
        (!col("ftype").isin(codingTypes.toSeq: _*)).as("non_coding"))
    val features = rows
      .withColumn("mapped",
        when(col("ftype") === "exon", "EXONS")
          .when(col("ftype") === "three_prime_UTR", "3UTRS")
          .when(col("ftype") === "five_prime_UTR", "5UTRS"))
      .filter(col("mapped").isNotNull)
      .select(xxhash64(col("parent")).as("tr_id"),
        col("mapped").as("ftype"),
        col("start").as("fstart"), col("stop").as("fstop"))
    ModelTables(genes, transcripts, features)
  }
}
