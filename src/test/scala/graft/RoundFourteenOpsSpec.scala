package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: the probe-many IVF serving path (dataset-keyed
  * index table + idempotent ensure), and the round's scale/parity
  * fixes.
  */
class RoundFourteenOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ivfIndexTable: dataset-keyed, stable, catalog-safe") {
    val a = Similarity.ivfIndexTable("/root/testdata/sf0.01")
    val b = Similarity.ivfIndexTable("/root/testdata/sf0.1")
    // keyed: two dirs never share a table (the r13 ADVICE race: a fixed
    // global name let one scale factor probe another's lists)
    assert(a != b)
    // stable: same dir → same name (the ensure path depends on it)
    assert(a == Similarity.ivfIndexTable("/root/testdata/sf0.01"))
    // catalog-safe identifier
    assert(a.matches("graft_ivf_index_[0-9a-f]{10}"))
  }

  test("ivfEnsureIndex: builds once, second call is a no-op") {
    val rnd = new scala.util.Random(14L)
    val emb = (0L until 150L).map(i =>
      (i, Array.fill(64)(rnd.nextFloat() * 2f - 1f))).toDF("vec_id", "embedding")
    val cent = Similarity.ivfQuantizer(16, 64)
    val table = "graft_ivf_ensure_spec"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    Similarity.ivfEnsureIndex(emb, "vec_id", "embedding", cent, table, buckets = 4)
    assert(spark.catalog.tableExists(table))
    // fingerprint the files the first build wrote…
    val warehouse = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, table)
    def listing(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = listing()
    // …a second ensure with DIFFERENT corpus rows must not rewrite:
    // existence IS the index (dataset-keyed names make that sound)
    Similarity.ivfEnsureIndex(emb.filter($"vec_id" < 10L),
      "vec_id", "embedding", cent, table, buckets = 4)
    assert(listing() == before, "second ensure must not touch the files")
    // and the table still probes like the fused in-memory search
    val q = emb.filter($"vec_id" % 30 === 0)
    val fromDisk = Similarity.ivfProbeIndex(spark, table, q,
      "vec_id", "embedding", cent, k = 3, nprobe = 2)
      .select("query_id", "corpus_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val fused = Similarity.ivfSearch(emb, q, "vec_id", "embedding", cent,
      k = 3, nprobe = 2)
      .select("query_id", "corpus_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fromDisk == fused)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }
}
