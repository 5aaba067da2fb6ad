package graft

import graft.sources.Ingest
import graft.tsdb.Series
import java.nio.file.Files

class IngestSourcesSpec extends SparkSpec {

  test("jsonl events flow through the same normalization as parquet") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("events.jsonl")
    Files.writeString(f,
      """{"event_id":1,"ts":"2024-01-01T00:15:00.000Z","user_id":7,"event_type":"click","value":1.5,"props":"{}"}
        |{"event_id":2,"ts":"2024-01-01T01:20:00.000Z","user_id":7,"event_type":"purchase","value":9.0,"props":"{}"}
        |{"event_id":3,"ts":"bogus","user_id":8,"event_type":"view","value":2.0,"props":"{}"}
        |""".stripMargin)
    val events = Ingest.eventsFromJsonl(spark, f.toString)
    val samples = Series.samples(events.filter(events("ts").isNotNull))
    val rows = samples.select("ts_us", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(rows == Set((1704068100000000L, 1.5), (1704072000000000L, 9.0)))
  }
}
