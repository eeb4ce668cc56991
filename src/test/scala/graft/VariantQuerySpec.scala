package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VariantQuery

class VariantQuerySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def storeDf = Seq(
    (11L, Some("rs1"), Some("A"), Some("G"), Some("snv"), None: Option[String],
      Some(3), "1", None: Option[String], 100L, 101L, Some("GENIC"), 60),
    (12L, None: Option[String], Some("C"), Some("T"), Some("snv"), None: Option[String],
      Some(3), "1", None: Option[String], 900L, 901L, Some("INTERGENIC"), 60),
    (13L, Some("rs3"), Some("G"), Some("C"), Some("snv"), None: Option[String],
      Some(3), "2", None: Option[String], 150L, 151L, Some("GENIC"), 60),
    (14L, None: Option[String], Some("T"), Some("A"), Some("snv"), None: Option[String],
      Some(3), "1", None: Option[String], 120L, 121L, Some("GENIC"), 70))
    .toDF("rgd_id", "rs_id", "ref_nuc", "var_nuc", "variant_type",
      "clinvar_id", "species_type_key", "chromosome", "padding_base",
      "start_pos", "end_pos", "genic_status", "map_key")

  test("mapQuery filters on (map_key, chromosome, range) and types rows") {
    val out = VariantQuery.mapQuery(storeDf, mapKey = 60, chr = "1",
      fromPos = 50L, toPos = 500L).collect()
    assert(out.map(_.rgd_id).toSet == Set(11L))
    val v = out.head
    assert(v.rs_id.contains("rs1") && v.genic_status.contains("GENIC") &&
      v.map_key == 60)
  }

  test("the query predicate reaches the parquet scan as pushed filters") {
    val dir = Files.createTempDirectory("graft-vmq").toString
    storeDf.write.parquet(s"$dir/store")
    val q = VariantQuery.mapQuery(spark.read.parquet(s"$dir/store"),
      mapKey = 60, chr = "1", fromPos = 50L, toPos = 500L)
    // the plan string truncates the PushedFilters list, so assert on the
    // leading entries rather than the range bound that falls past the cut
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(map_key)") &&
      scan.contains("EqualTo(map_key,60)"),
      s"predicate not pushed to scan:\n$scan")
    assert(q.collect().map(_.rgd_id).toSet == Set(11L))
  }
}
