package graft

import graft.tsdb.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val chunk = 100L // tiny chunk so multi-chunk intervals are cheap to build

  private def pts = Seq(
    // (key, event_id, ts_us)
    (1L, 10L, 50L),
    (1L, 11L, 100L),  // == start of iv B
    (1L, 12L, 250L),  // == end of iv B
    (1L, 13L, 999L),  // matches nothing
    (2L, 20L, 120L))  // same ts range, different key
    .toDF("k", "event_id", "ts_us")

  private def ivs = Seq(
    // (key, iv_id, start_us, end_us)
    (1L, 100L, 0L, 60L),     // covers pt 10
    (1L, 101L, 100L, 250L),  // spans 3 chunks; covers pts 11,12
    (1L, 102L, 40L, 110L),   // OVERLAPS iv 100 and 101: pts 10,11 match twice
    (2L, 200L, 100L, 130L))  // covers pt 20 only (key isolation)
    .toDF("k", "iv_id", "start_us", "end_us")

  test("containment with inclusive bounds, key isolation, overlapping intervals") {
    val out = RangeJoin.pointsInIntervals(pts, ivs, Seq("k"), chunkUs = chunk)
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(out == Set(
      (10L, 100L), (10L, 102L),
      (11L, 101L), (11L, 102L),
      (12L, 101L),
      (20L, 200L)))
  }

  test("multi-chunk interval matches points in every covered chunk, exactly once") {
    val p = Seq((1L, 1L, 105L), (1L, 2L, 199L), (1L, 3L, 201L)).toDF("k", "event_id", "ts_us")
    val i = Seq((1L, 9L, 100L, 250L)).toDF("k", "iv_id", "start_us", "end_us")
    val out = RangeJoin.pointsInIntervals(p, i, Seq("k"), chunkUs = chunk)
      .groupBy("event_id").count().as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // no duplicate matches
  }

  test("plans as a hash join on (key, chunk) — never a nested loop") {
    val df = RangeJoin.pointsInIntervals(pts, ivs, Seq("k"), chunkUs = chunk)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoop"), "range join fell back to BNLJ:\n" + p.take(1200))
    assert(p.contains("Join"), "join disappeared")
  }

  test("keyless variant still equi-joins on the chunk") {
    val df = RangeJoin.pointsInIntervals(
      pts.select("event_id", "ts_us"),
      ivs.filter($"k" === 1).select("iv_id", "start_us", "end_us"),
      Nil, chunkUs = chunk)
    df.count()
    assert(!df.queryExecution.executedPlan.toString.contains("NestedLoop"))
    // 50→{100,102}, 100→{101,102}, 250→{101}, 999→∅, 120→{101}
    assert(df.count() == 6)
  }
}
