package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed event-rate aggregation, usable identically over a batch
  * DataFrame or a Structured Streaming source (the transformation is the
  * same logical plan; `readStream` + watermark turns it incremental).
  *
  * Streaming shape:
  * {{{
  *   val src = spark.readStream.schema(eventsSchema).parquet(dir)
  *   EventRates.windowed(src.withWatermark("ts", "10 minutes"))
  *     .writeStream.outputMode("append")...
  * }}}
  */
object EventRates {

  /** 5-minute tumbling-window counts and value sums per event type. */
  def windowed(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count("*").as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Batch-equivalent formulation with an oracle-friendly group key
    * (epoch-floored timestamps rather than Spark's window struct).
    * Handles `ts` as TimestampType or as raw INT64 nanos (see
    * Tables.events); nanos use exact integer division — double division
    * at 1e18 scale is off by up to ~0.4 s. */
  def windowedBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val tsSec = events.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000000000")
      case _        => unix_timestamp(col("ts"))
    }
    events
      .groupBy(((tsSec / 300).cast("long") * 300).as("window_epoch"),
        col("event_type"))
      .agg(count("*").as("n_events"),
        round(sum("value"), 2).as("sum_value"))
  }
}
