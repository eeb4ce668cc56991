package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.VariantMerge

/** Streaming absorption of variant micro-batches into a loaded-variant
  * store — the streaming twin of the reference's daily
  * VERIFY_IF_IN_RGD batch load (VariantLoad3.saveVariants, re-expressed
  * as [[VariantMerge.classify]]).
  *
  * Each micro-batch is classified against the current store inside
  * `foreachBatch`; only the "insert" rows are appended, so replays and
  * duplicate deliveries are idempotent at the natural-key level. With
  * the store maintained by [[VariantMerge.writeBucketed]] on the same
  * key, the per-batch classify join reads the store pre-partitioned —
  * the batch side is micro-batch-sized, so steady-state absorption does
  * no store-side shuffle at any store size.
  */
object StreamMerge {

  /** Start absorbing `incoming` (a streaming DataFrame of variant rows)
    * into the parquet-backed `storeTable`. The store must exist (create
    * it with [[VariantMerge.writeBucketed]], possibly empty). */
  def absorb(incoming: DataFrame, storeTable: String, key: Seq[String],
             checkpoint: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val existing = spark.table(storeTable)
          .select((key.map(col) :+ col("variant_id")): _*)
        val inserts = VariantMerge
          .classify(batch.dropDuplicates(key), existing, key, "variant_id")
          .filter(col("merge_action") === "insert")
          .withColumn("variant_id", xxhash64(key.map(col): _*))
          .select(spark.table(storeTable).columns.map(col): _*)
        inserts.write.mode("append").insertInto(storeTable)
      }
      .start()
}
