package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamIngest
import graft.tsdb.{Series, TsOps}

/** Streaming Prometheus alerting (FOR semantics in
  * flatMapGroupsWithState) converges to the batch
  * [[TsOps.alertFiring]] on ordered per-series arrival — the
  * reference's rule-evaluator state machine as an O(1)-state
  * streaming operator. */
class StreamAlertSpec extends SparkSpec {
  import spark.implicits._

  private val hUs = 3600000000L

  test("streaming FOR state machine == batch alertFiring across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Double)]
    val samples = input.toDF().toDF("series_id", "ts_us", "event_id", "value")

    val q = StreamIngest.alertStream(samples, 10.0, 5400000000L).writeStream
      .format("memory").queryName("alert_stream").outputMode("append").start()

    // series A: true(0h), true(1h) | batch cut | FALSE(2h), true(3h),
    // true(4h), true(5h) — the run must survive the batch boundary,
    // reset at 2h, and fire at 5h. series B stays below threshold.
    // batch 1 arrives out of order within the batch.
    input.addData(("A", 1L * hUs, 2L, 30.0), ("A", 0L * hUs, 1L, 20.0), ("B", 0L * hUs, 7L, 5.0))
    q.processAllAvailable()
    input.addData(("A", 2L * hUs, 3L, 5.0), ("A", 3L * hUs, 4L, 25.0))
    q.processAllAvailable()
    input.addData(("A", 4L * hUs, 5L, 25.0), ("A", 5L * hUs, 6L, 25.0), ("B", 5L * hUs, 8L, 6.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("alert_stream")
      .select("series_id", "ts_us", "active_since_us", "state")
      .as[(String, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq

    assert(streamed == Seq(
      ("A", 0L * hUs, 0L, "pending"),
      ("A", 1L * hUs, 0L, "pending"),
      ("A", 3L * hUs, 3L * hUs, "pending"),
      ("A", 4L * hUs, 3L * hUs, "pending"),
      ("A", 5L * hUs, 3L * hUs, "firing")))

    // batch parity on the same data (ns-grain events frame)
    val ev = Seq(
      (1L, 0L * hUs * 1000, 1L, "click", 20.0),
      (2L, 1L * hUs * 1000, 1L, "click", 30.0),
      (3L, 2L * hUs * 1000, 1L, "click", 5.0),
      (4L, 3L * hUs * 1000, 1L, "click", 25.0),
      (5L, 4L * hUs * 1000, 1L, "click", 25.0),
      (6L, 5L * hUs * 1000, 1L, "click", 25.0),
      (7L, 0L * hUs * 1000, 2L, "view", 5.0),
      (8L, 5L * hUs * 1000, 2L, "view", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = TsOps.alertFiring(Series.samples(ev), 10.0, 5400000000L)
      .select("ts_us", "active_since_us", "state")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(batch == streamed.map(r => (r._2, r._3, r._4)),
      s"stream/batch divergence: $batch vs $streamed")
  }

  test("duplicate timestamps follow the batch (ts, event_id) tiebreak") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Double)]
    val samples = input.toDF().toDF("series_id", "ts_us", "event_id", "value")
    val q = StreamIngest.alertStream(samples, 10.0, 1L * hUs).writeStream
      .format("memory").queryName("alert_stream_tie").outputMode("append").start()
    // same ts: event 1 true, event 2 FALSE — batch order processes the
    // false second, so the run resets and 1h later is a FRESH pending
    // (a value-ordered sort would process 5.0 first and keep the run)
    input.addData(("T", 0L, 1L, 30.0), ("T", 0L, 2L, 5.0), ("T", 1L * hUs, 3L, 30.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("alert_stream_tie")
      .select("ts_us", "active_since_us", "state")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(rows == Seq((0L, 0L, "pending"), (1L * hUs, 1L * hUs, "pending")))
  }

  test("state stays O(1): a long-running always-true series keeps one run start") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Double)]
    val samples = input.toDF().toDF("series_id", "ts_us", "event_id", "value")
    val q = StreamIngest.alertStream(samples, 0.0, 2L * hUs).writeStream
      .format("memory").queryName("alert_stream2").outputMode("append").start()
    (0 until 5).foreach { b =>
      input.addData((0 until 20).map(i => ("S", (b * 20 + i) * hUs, i.toLong, 1.0)): _*)
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table("alert_stream2")
      .select("active_since_us", "state").as[(Long, String)].collect()
    assert(rows.length == 100)
    assert(rows.forall(_._1 == 0L), "run start drifted across batches")
    assert(rows.count(_._2 == "firing") == 98) // ts 2h..99h inclusive
  }
}
