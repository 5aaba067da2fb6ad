package graft

import graft.streaming.StreamIngest
import graft.streaming.StreamIngest.{SessionEvent, SessionOut}
import graft.tsdb.{ChunkStore, MatchEq}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

class StreamSessionSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = StreamIngest.sessionizeStream(input.toDS(), gapUs = 1000000L) // 1s gap
    val q = out.writeStream.format("memory").queryName("sessions").outputMode("append").start()

    val us = 1704067200000000L
    // user 1: two bursts 10s apart → first session closes when the
    // second burst arrives in a later batch
    input.addData(SessionEvent(1L, us, 1.0), SessionEvent(1L, us + 500000, 2.0))
    q.processAllAvailable()
    input.addData(SessionEvent(1L, us + 10000000, 4.0))
    q.processAllAvailable()

    val rows = spark.table("sessions").as[SessionOut].collect()
    q.stop()
    assert(rows.length == 1)
    assert(rows.head == SessionOut(1L, us, us + 500000, 2, 3.0))
  }

  test("streaming chunk sink lands batches in hour partitions") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream_chunks").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val store = new ChunkStore(spark, dir)

    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamIngest.startChunkSink(events, store, ckpt)

    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:15:00")
    input.addData((1L, ts(0), 1L, "click", 1.0), (2L, ts(1), 1L, "click", 2.0))
    q.processAllAvailable()
    input.addData((3L, ts(1), 2L, "view", 3.0))
    q.processAllAvailable()
    q.stop()

    assert(store.live().count() == 3)
    assert(store.live().select("chunk").distinct().count() == 2)
    val r = store.query(Seq(MatchEq("event_type", "click")),
      1704067200000000L, 1704067200000000L + 2L * 3600 * 1000000)
    assert(r.count() == 2)
  }
}
