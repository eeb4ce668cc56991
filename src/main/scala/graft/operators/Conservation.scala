package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UCSC fixedStep wiggle parser — ConservationScoreLoader.java:22-60.
  *
  * Input is wiggle text: `fixedStep chrom=<c> start=<s> step=<t>`
  * declaration lines, each followed by one score per line; the k-th line
  * after a declaration is at position `start + k*step`. Chromosome names
  * longer than 2 chars (unmapped contigs) are skipped, but still advance
  * the position counter — exactly the reference's loop.
  *
  * Spark shape: the position of a data line depends only on its global
  * line index and its governing declaration, so instead of a stateful
  * scan we (1) index every line (`zipWithIndex` preserves text order),
  * (2) lift the tiny declaration set into [decl_idx, next_decl) blocks,
  * (3) binned-interval-join data lines to their block ([[RangeJoin]] —
  * broadcast when the block table is small, so the data side never
  * shuffles), and (4) compute `pos = start + (idx - decl_idx - 1) * step`
  * as a narrow projection. Declarations are ~1 per thousands of data
  * lines, so the block table stays dim-sized even at 100 TB.
  */
object Conservation {

  def parseFixedStep(lines: Dataset[String], binWidth: Long = 1 << 16): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    // cached: scanned by the declaration pass, the max-index bound and
    // the data pass (callers streaming a one-shot source should persist
    // upstream instead)
    val idxed = lines.rdd.zipWithIndex().toDF("line", "idx").cache()

    val isDecl = col("line").startsWith("fixedStep")
    val decls = idxed.filter(isDecl)
      .select(col("idx").as("decl_idx"),
        regexp_extract(col("line"), "chrom=(\\S+)", 1).as("raw_chr"),
        regexp_extract(col("line"), "start=(\\d+)", 1).cast("long").as("wstart"),
        coalesce(nullif(regexp_extract(col("line"), "step=(\\d+)", 1), lit(""))
          .cast("long"), lit(1L)).as("step"))
      .withColumn("chr",
        when(col("raw_chr").startsWith("chr"), expr("substring(raw_chr, 4)"))
          .otherwise(col("raw_chr")))
    val maxIdx = idxed.agg(max("idx")).head().getLong(0)
    // declaration table is tiny — a single-partition window is fine here
    val blocks = decls
      .withColumn("next_idx",
        coalesce(lead("decl_idx", 1).over(Window.orderBy("decl_idx")),
          lit(maxIdx + 1)))
      .select(col("chr"), col("wstart"), col("step"),
        (col("decl_idx") + 1).as("bstart"), (col("next_idx") - 1).as("bstop"),
        col("decl_idx"))
      .filter(col("bstart") <= col("bstop"))

    val data = idxed.filter(!isDecl && length(trim(col("line"))) > 0)
    RangeJoin.joined(data, blocks, "idx", "bstart", "bstop",
        keys = Nil, binWidth = binWidth)
      .filter(length(col("chr")) <= 2)
      .select(col("chr"),
        (col("wstart") + (col("idx") - col("decl_idx") - 1) * col("step"))
          .as("pos"),
        col("line").cast("double").as("score"))
  }
}
