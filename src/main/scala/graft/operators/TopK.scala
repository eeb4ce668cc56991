package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global ranked top-k WITHOUT a single-partition window.
  *
  * `row_number() OVER (ORDER BY …)` funnels the WHOLE input through one
  * task before any `rank <= k` filter can cut it — the scale-killer
  * shape ([[Curation.shardBalanced]]'s doc names it; the reference's
  * `VariantQuery.java` ORDER BY has the same single-cursor property).
  * Here the sort+limit plans as `TakeOrderedAndProject` — per-partition
  * k-row heaps, then one k-row merge — and the 1-based rank is derived
  * from the already-k-row result by `zipWithIndex` (the shardBalanced
  * discipline). Nothing larger than k rows ever sits in one task.
  *
  * The ordering must be TOTAL (include a unique tiebreak column) or
  * ranks are nondeterministic under retries — same contract as the
  * window formulation it replaces.
  */
object TopK {

  /** @return (rank BIGINT, …df's columns), the top `k` rows of `df`
    *         under `order`, rank 1..k in that order */
  def ranked(df: DataFrame, k: Int, order: Column*): DataFrame = {
    require(k > 0, "k must be positive")
    require(!df.columns.contains("rank"),
      "input already has a 'rank' column")
    val sorted = df.orderBy(order: _*).limit(k)
    // TakeOrderedAndProject emits ONE partition in sort order, so
    // zipWithIndex is rank-1 immediately (and its startIndices job is
    // vacuous at a single partition — no extra Spark job)
    sorted.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq((i + 1L) +: r.toSeq)
      },
      StructType(StructField("rank", LongType, nullable = false)
        +: sorted.schema.fields))
  }
}
