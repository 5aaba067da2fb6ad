package graft

import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed ingest converges to the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val agg = StreamIngest.windowCounts(StreamIngest.withWatermark(events))
    val q = agg.writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("complete")
      .start()

    def t(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    input.addData(
      (t(1), "click", 1.0), (t(2), "click", 2.0), (t(5), "view", 10.0))
    q.processAllAvailable()
    input.addData((t(7), "click", 4.0))
    q.processAllAvailable()

    val got = spark.table("win_counts")
      .select("event_type", "n_events", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    q.stop()

    // batch run over the same rows must agree (prefix consistency)
    val batch = Seq(
      (t(1), "click", 1.0), (t(2), "click", 2.0),
      (t(5), "view", 10.0), (t(7), "click", 4.0))
      .toDF("ts", "event_type", "value")
    val expect = StreamIngest.windowCounts(batch)
      .select("event_type", "n_events", "sum_value")
      .as[(String, Long, Double)].collect().toSet
    assert(got == expect)
    assert(got.contains(("click", 3L, 7.0)))
  }

  test("windowed parquet sink persists exactly the watermark-closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_win_parquet").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_win_ckpt").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = StreamIngest.withWatermark(
      input.toDF().toDF("ts", "event_type", "value"), "5 minutes")
    val q = StreamIngest.startWindowedParquetSink(events, outDir, ckpt)

    def t(h: Int, min: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$min%02d:00")
    input.addData((t(0, 1), "click", 1.0), (t(0, 2), "click", 2.0))
    q.processAllAvailable()
    // advance the watermark past hour 0; its window becomes FINAL and
    // lands in parquet; hour 1 stays open and must NOT appear
    input.addData((t(1, 30), "view", 10.0))
    q.processAllAvailable()
    input.addData((t(1, 31), "view", 1.0)) // extra trigger flushes the emit
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(outDir)
      .select("window_start_ms", "event_type", "n_events", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    assert(rows == Set((Timestamp.valueOf("2024-01-01 00:00:00").getTime,
      "click", 2L, 3.0)), s"got $rows")
  }
}
