package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamIngest

class StreamGapSpec extends SparkSpec {
  import spark.implicits._

  private val hu = 3600000000L
  private def ev(id: Long, hour: Long, u: Long): (Long, Long, Long, String, Double) =
    (id, hour * hu * 1000L, u, "t", 1.0)

  test("gaps emit on the healing arrival; a boundary-straddling gap emits once, exactly") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = StreamIngest.gapStream(events, gapUs = 10 * hu).writeStream
      .format("memory").queryName("gap_stream").outputMode("append").start()

    // batch 1: user 1 at hours 0, 1 — the gap to hour 50 is still open
    input.addData(Seq(ev(1, 0, 1), ev(2, 1, 1)): _*)
    q.processAllAvailable()
    // batch 2: the healing arrival at hour 50 closes the straddling
    // gap (1 -> 50); an in-batch gap 50 -> 80 also emits; user 2 is
    // dense and stays silent
    input.addData(Seq(ev(3, 50, 1), ev(4, 80, 1),
      ev(5, 0, 2), ev(6, 5, 2), ev(7, 9, 2)): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("gap_stream")
      .select("series_id", "gap_start_us", "gap_end_us", "gap_us")
      .as[(String, Long, Long, Long)].collect().toSeq
      .sortBy(_._2)
    assert(got.map(g => (g._2 / hu, g._3 / hu, g._4 / hu)) ==
      Seq((1L, 50L, 49L), (50L, 80L, 30L)), got)
    assert(got.map(_._1).distinct.size == 1)

    // batch-mode run over the same rows = the same gap set (the
    // batch-lag-pass equivalence the gate relies on)
    val all = Seq(ev(1, 0, 1), ev(2, 1, 1), ev(3, 50, 1), ev(4, 80, 1),
      ev(5, 0, 2), ev(6, 5, 2), ev(7, 9, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = StreamIngest.gapStream(all, gapUs = 10 * hu)
      .collect().map(g => (g.gap_start_us / hu, g.gap_end_us / hu)).toSeq.sorted
    assert(batch == Seq((1L, 50L), (50L, 80L)), batch)
  }
}
