package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-error contract for the rows-only sketch_stats query: sketches
  * are engine-specific by design (no DuckDB twin can hash-match), but
  * their PUBLISHED error bounds are checkable against the exact answers
  * on the same data — HLL++ distinct counts within a few rsd, KLL-style
  * quantiles within rank error of the sort-based percentile. This turns
  * the one ungraded entry into a contract instead of a trust-me. */
class SketchBoundsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within 4x the configured rsd") {
    assume(new java.io.File(dir).isDirectory, "testdata unavailable here")
    val sketch = SparkEntry.queries("sketch_stats")(spark, dir)
      .select("event_type", "approx_users")
      .as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, dir)
      .groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .as[(String, Long)].collect().toMap
    assert(sketch.keySet == exact.keySet)
    for ((et, ex) <- exact) {
      val err = math.abs(sketch(et) - ex).toDouble / ex
      assert(err <= 4 * 0.02,
        s"$et: approx ${sketch(et)} vs exact $ex (rel err $err)")
    }
  }

  test("approx quantiles fall inside the rank-error window of the exact") {
    assume(new java.io.File(dir).isDirectory, "testdata unavailable here")
    val sketch = SparkEntry.queries("sketch_stats")(spark, dir)
      .select("event_type", "q50", "q95", "q99")
      .collect().map(r => r.getString(0) ->
        Seq(0.50 -> r.getDouble(1), 0.95 -> r.getDouble(2),
          0.99 -> r.getDouble(3))).toMap
    // exact order statistics per group (sf0.001 groups are collect-sized);
    // window = published rank error (1/accuracy) + two order statistics
    // of slack, because percentile_approx returns actual data points
    // while the interpolated `percentile` sits between them
    val byType = Tables.events(spark, dir)
      .select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(sketch.keySet == byType.keySet)
    for ((et, qs) <- sketch; (p, approx) <- qs) {
      val sorted = byType(et)
      val n = sorted.length
      val eps = 1.0 / 10000 + 2.0 / n
      val lo = sorted(math.max(0, math.floor((p - eps) * (n - 1)).toInt))
      val hi = sorted(math.min(n - 1, math.ceil((p + eps) * (n - 1)).toInt))
      assert(approx >= lo - 1e-4 && approx <= hi + 1e-4,
        s"$et p$p: approx $approx outside exact rank window [$lo, $hi] (n=$n)")
    }
  }
}
