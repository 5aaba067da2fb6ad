package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamIngest
import java.sql.Timestamp

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("stream-stream interval join attributes purchases to in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]

    val joined = StreamIngest.attributionJoin(
      clicks.toDF().toDF("event_id", "ts", "user_id"),
      purchases.toDF().toDF("event_id", "ts", "user_id", "value"),
      within = "1 hour")
    val q = joined.writeStream
      .format("memory").queryName("attrib").outputMode("append").start()

    // user 1: click @0:05 → purchase @0:30 (in window) and @2:00 (out);
    // user 2: purchase @0:10 with no prior click (purchase BEFORE the
    // user's only click @0:20 must not attribute backwards)
    clicks.addData((100L, t(5), 1L), (101L, t(20), 2L))
    purchases.addData((200L, t(30), 1L, 9.0), (201L, t(10), 2L, 5.0))
    q.processAllAvailable()
    // second batch arrives later: out-of-window purchase + a second
    // in-window click/purchase pair across batches for user 3
    clicks.addData((102L, t(115), 3L))
    purchases.addData((202L, t(120), 1L, 7.0), (203L, t(130), 3L, 3.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attrib")
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 200L), (102L, 203L)), s"got $out")
  }
}
