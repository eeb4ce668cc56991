package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed variant-store point query — the VariantMapQuery row mapper
  * (reference VariantMapQuery.java:1-36, a MappingSqlQuery producing
  * VariantMapData beans) re-expressed as a case-class Encoder over the
  * variant parquet: the "mapper" is the Encoder, and the query predicate
  * reaches the scan as pushed filters instead of a WHERE clause shipped
  * to a database. On a store written with writeBucketed/partitioned by
  * (map_key, chromosome) the filter prunes partitions before any IO. */
object VariantQuery {

  /** The VariantMapData bean, field for field. */
  case class VariantMapData(
      rgd_id: Long, rs_id: Option[String], ref_nuc: Option[String],
      var_nuc: Option[String], variant_type: Option[String],
      clinvar_id: Option[String], species_type_key: Option[Int],
      chromosome: String, padding_base: Option[String],
      start_pos: Long, end_pos: Long, genic_status: Option[String],
      map_key: Int)

  /** Point query by (map_key, chromosome, position range) — the three
    * dimensions the reference's callers bind into the SQL it wraps. */
  def mapQuery(store: DataFrame, mapKey: Int, chr: String,
               fromPos: Long, toPos: Long): Dataset[VariantMapData] = {
    val spark = store.sparkSession
    import spark.implicits._
    store
      .filter(col("map_key") === mapKey && col("chromosome") === chr &&
        col("start_pos").between(fromPos, toPos))
      .as[VariantMapData]
  }
}
