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
  test("corrupt JSONL: every 10th line lands in _corrupt with all fields NULL; the rest roundtrip") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_dl_spec").toString
    val ev = Seq(
      (10L, 1000L, 1L, "a", 1.5),   // id % 10 == 0 -> corrupted
      (11L, 2000L, 2L, "b", 2.5),
      (20L, 3000L, 3L, "c", 3.5),   // corrupted
      (21L, 4000L, 4L, "d", 4.5))
      .map { case (id, us, u, t, v) => (id, us * 1000L, u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    Ingest.writeJsonlCorrupted(ev, dir)
    // cache first: Spark disallows corrupt-column-ONLY queries over a
    // raw JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the gate
    // always reads data columns alongside, so only the spec's
    // corrupt-side slicing needs the materialization
    val back = Ingest.eventsFromJsonlPermissive(spark, dir).cache()
    back.count()
    val bad = back.filter(col("_corrupt").isNotNull)
    assert(bad.count() == 2)
    // corrupt rows carry NO parsed fields (no half-parsed leakage)
    assert(bad.filter(col("event_id").isNotNull || col("value").isNotNull).count() == 0)
    // the raw line is preserved for the dead-letter queue
    assert(bad.select("_corrupt").as[String].collect().forall(_.startsWith("{\"event_id\"")))
    val good = back.filter(col("_corrupt").isNull)
      .select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(good == Set((11L, "b", 2.5), (21L, "d", 4.5)))
  }
}
