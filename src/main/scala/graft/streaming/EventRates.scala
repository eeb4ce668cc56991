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
    events
      .groupBy(((tsSecCol(events) / 300).cast("long") * 300).as("window_epoch"),
        col("event_type"))
      .agg(count("*").as("n_events"),
        round(sum("value"), 2).as("sum_value"))
  }

  /** 10-minute windows sliding every 5 — the overlapping-window twin of
    * [[windowed]], identical plan batch or streaming. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count("*").as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Oracle-friendly batch twin of [[sliding]]: every event belongs to
    * exactly width/slide = 2 slide-aligned windows, materialized by a
    * bounded explode (factor 2 — NOT a range join against a window
    * table, which would shuffle the window grid at scale). Window
    * starts are the epoch-aligned multiples of the slide, matching
    * Spark's `window()` alignment. */
  def slidingBatch(events: DataFrame): DataFrame = {
    val s0 = ((tsSecCol(events) / 300).cast("long") * 300)
    events
      .select(explode(array(s0, s0 - 300)).as("window_epoch"),
        col("event_type"), col("value"))
      .groupBy("window_epoch", "event_type")
      .agg(count("*").as("n_events"),
        round(sum("value"), 2).as("sum_value"))
  }

  /** Integral epoch seconds from `ts` whether it arrived as a real
    * timestamp or as raw INT64 nanos (see Tables.events). */
  private def tsSecCol(events: DataFrame) = {
    import org.apache.spark.sql.types.LongType
    events.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000000000")
      case _        => unix_timestamp(col("ts"))
    }
  }
}
