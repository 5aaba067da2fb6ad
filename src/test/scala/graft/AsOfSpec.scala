package graft

import graft.tsdb.AsOf
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 100L, 10.0), (1L, 200L, 20.0), (1L, 50L, 5.0),
      (2L, 100L, 1.0))
      .toDF("user_id", "ts_us", "value")
    val right = Seq(
      (1L, 100L, 0.5), (1L, 150L, 0.7), (2L, 300L, 0.9))
      .toDF("user_id", "ts_us", "rv")

    val out = AsOf.joinAsOf(left, right, Seq("user_id"), "ts_us", "rv", "last_rv")
      .select("user_id", "ts_us", "value", "last_rv")
      .as[(Long, Long, Double, Option[Double])].collect().toSet

    assert(out == Set(
      (1L, 50L, 5.0, None),          // no right row yet
      (1L, 100L, 10.0, Some(0.5)),   // equal ts is inclusive
      (1L, 200L, 20.0, Some(0.7)),   // latest ≤ 200 is 150
      (2L, 100L, 1.0, None)))        // right row is later
  }

  test("latestPerTs dedupes ties by id") {
    val r = Seq((1L, 100L, 1L, 0.1), (1L, 100L, 2L, 0.2), (1L, 200L, 3L, 0.3))
      .toDF("user_id", "ts_us", "event_id", "rv")
    val d = AsOf.latestPerTs(r, Seq("user_id"), "ts_us", "event_id", "rv")
      .as[(Long, Long, Double)].collect().toSet
    assert(d == Set((1L, 100L, 0.2), (1L, 200L, 0.3)))
  }
}
