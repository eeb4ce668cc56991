package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating expression: one VCF INFO string → N SnpEff
  * annotation rows with 11 typed fields, parsed in a single imperative
  * pass (SnpEffLoader.java:130-167 semantics, empty field → null).
  *
  * A Generator sidesteps the projection-collapse trap entirely: the
  * input evaluates once per row and emits complete rows, where a
  * split-per-field projection re-scanned the annotation string once per
  * column.
  */
case class SnpEffAnnotations(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  val fieldNames: Seq[String] = Seq(
    "allele", "effect", "impact", "gene_symbol", "gene_id", "feature",
    "feature_id", "bio_type", "rank", "hgvs_c", "hgvs_p")

  override def elementSchema: StructType =
    StructType(fieldNames.map(StructField(_, StringType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    val info = raw.asInstanceOf[UTF8String].toString
    val annStart = {
      if (info.startsWith("ANN=")) 4
      else {
        val i = info.indexOf(";ANN=")
        if (i < 0) return Nil else i + 5
      }
    }
    val annEnd = {
      val i = info.indexOf(';', annStart)
      if (i < 0) info.length else i
    }
    if (annEnd <= annStart) return Nil
    info.substring(annStart, annEnd).split(",", -1).iterator.map { annot =>
      val f = annot.split("\\|", -1)
      val vals = new Array[Any](fieldNames.length)
      var i = 0
      while (i < fieldNames.length) {
        vals(i) =
          if (i < f.length && f(i).nonEmpty) UTF8String.fromString(f(i))
          else null
        i += 1
      }
      new GenericInternalRow(vals)
    }.toSeq
  }

  override protected def withNewChildInternal(c: Expression): SnpEffAnnotations =
    copy(c)
}

object SnpEffGen {
  /** Generator column: `df.select(col("*"), SnpEffGen.annotations(col("info")))`
    * expands to one row per annotation with the 11 fields as columns. */
  def annotations(info: Column): Column =
    ColumnBridge.column(SnpEffAnnotations(ColumnBridge.expression(info)))
}
