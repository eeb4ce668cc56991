package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VariantMerge

/** Bucketed-layout demo: joins between tables bucketed on the same key
  * plan with no shuffle exchange — the steady-state merge shape at scale. */
class BucketedMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merge against a bucketed table plans without a shuffle") {
    val key = Seq("chr", "pos")
    val existing = (1 to 500).map(i => (s"chr${i % 3}", i.toLong, i * 10L))
      .toDF("chr", "pos", "variant_id")
    val incoming = (400 to 900).map(i => (s"chr${i % 3}", i.toLong))
      .toDF("chr", "pos")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      VariantMerge.writeBucketed(existing, "graft_test_existing", key, 8)
      VariantMerge.writeBucketed(incoming.withColumn("variant_id", lit(0L)),
        "graft_test_incoming", key, 8)

      val ex = spark.table("graft_test_existing")
      val inc = spark.table("graft_test_incoming").drop("variant_id")
      val merged = VariantMerge.classify(inc, ex, key, "variant_id")
      val plan = merged.queryExecution.executedPlan.toString

      // both sides bucketed on the join key: no ShuffleExchange anywhere
      assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle:\n$plan")

      val actions = merged.groupBy("merge_action").count()
        .as[(String, Long)].collect().toMap
      assert(actions("already_in_rgd") == 101L) // 400..500 overlap
      assert(actions("insert") == 400L)         // 501..900
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_test_existing")
      spark.sql("DROP TABLE IF EXISTS graft_test_incoming")
    }
  }

  test("date-partitioned write prunes partitions on read") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    // 10 days of rows, one partition dir per day
    val rows = (1 to 1000).map(i => (i.toLong, i % 10))
      .toDF("id", "day_off")
      .withColumn("event_date", date_add(lit(java.sql.Date.valueOf("2024-01-01")), col("day_off")))
      .drop("day_off")
    rows.write.mode("overwrite").partitionBy("event_date").parquet(dir)

    val back = spark.read.parquet(dir)
      .where(col("event_date") === lit(java.sql.Date.valueOf("2024-01-03")))
    assert(back.count() == 100L)

    // the filter must land in PartitionFilters (directory pruning: at
    // scale this is the difference between listing one partition and
    // scanning the table) — NOT in dataFilters/PushedFilters. Metrics
    // belong to THIS df's plan, so execute its own QueryExecution
    // (count() above built a separate one).
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.nonEmpty, "partition filter not applied")
    back.queryExecution.toRdd.foreach(_ => ())
    val allFiles = scan.relation.location.inputFiles.length
    val readFiles = scan.metrics("numFiles").value
    assert(readFiles < allFiles,
      s"scan did not prune: read $readFiles of $allFiles files")
  }
}
