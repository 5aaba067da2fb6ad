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

  test("schema evolution: one scan spans partitions with and without the new column") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve")
    // old partition: no props column
    Seq((1L, 1.0)).toDF("event_id", "value")
      .write.parquet(s"$dir/old")
    // new partition: props added mid-history
    Seq((2L, 2.0, "{\"k\":1}")).toDF("event_id", "value", "props")
      .write.parquet(s"$dir/new")
    val all = Ingest.eventsEvolved(spark, s"$dir/old", s"$dir/new")
    assert(all.columns.toSet == Set("event_id", "value", "props"))
    val rows = all.select("event_id", "props").as[(Long, Option[String])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).contains("{\"k\":1}"))
  }

  test("schema evolution: incompatible column types fail loudly, not coerce silently") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve_bad")
    Seq((1L, 1.0)).toDF("event_id", "value").write.parquet(s"$dir/a")
    Seq(("oops", 2.0)).toDF("event_id", "value").write.parquet(s"$dir/b")
    val ex = intercept[Exception] {
      Ingest.eventsEvolved(spark, s"$dir/a", s"$dir/b").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("merge") ||
      ex.getMessage.toLowerCase.contains("incompatible"), ex.getMessage.take(300))
  }
}
