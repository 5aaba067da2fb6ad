package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest — the reference's WAL + remote-write path
  * (src/wal/, src/server.rs:170-179) re-expressed as Structured
  * Streaming: `readStream` → event-time watermark → windowed
  * aggregation. The same transforms run identically on a batch
  * DataFrame (used by the oracle-checked `stream_window_counts`
  * query) — Structured Streaming's prefix-consistency guarantee means
  * the streaming result converges to the batch result.
  */
object StreamIngest {

  /** Tumbling-window per-event_type counts + exact value sums.
    * `events` may be a streaming or batch frame with (ts, event_type,
    * value). On streaming input add [[withWatermark]] first. */
  def windowCounts(events: DataFrame, windowDuration: String = "1 hour"): DataFrame = {
    val eventTs = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    events
      .groupBy(window(eventTs, windowDuration), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,2)")).cast("double").as("sum_value"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  def withWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** Streaming write of the windowed aggregate — update mode, one
    * in-flight batch per trigger. Checkpointed: exactly-once per the
    * Structured Streaming model (SIGMOD'18 paper §5). */
  def startConsoleSink(agg: DataFrame, checkpoint: String) =
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .format("console")
      .start()
}
