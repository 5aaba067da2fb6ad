package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.tsdb.{Series, TsOps}
import graft.streaming.StreamIngest

/** The driver has regenerated testdata with a DIFFERENT physical
  * event-time type more than once: TIMESTAMP(NANOS) (readable only as
  * a nanos LONG under nanosAsLong), then TIMESTAMP(US,
  * isAdjustedToUTC=false) = TIMESTAMP_NTZ (round 7 — the whole ts
  * family went dark in BENCH_r06 because tsUs only knew LONG and TZ).
  * This spec pins all three physical types to ONE logical answer so
  * the next regeneration fails here, in seconds, instead of in the
  * driver's round gate. */
class TsTypeEvolutionSpec extends SparkSpec {

  // epoch-micros instants, including exact bucket/bound edges
  private val us = Seq(
    1704067200000000L,      // 2024-01-01 00:00:00 exactly (range lower bound)
    1704067200000001L,
    1704070799999999L,      // one micro before the next hour
    1704070800000000L,      // exact hour edge
    1704153600000000L,      // next day (range upper bound)
    1704153600000001L)      // just past the upper bound

  private def base = {
    import spark.implicits._
    us.zipWithIndex.map { case (u, i) => (i.toLong, u, "view", i.toLong % 2, 1.5 * i) }
      .toDF("event_id", "us", "event_type", "user_id", "value")
  }

  /** (ts as nanos LONG, ts as TIMESTAMP, ts as TIMESTAMP_NTZ) frames
    * encoding the same instants, same schema otherwise. */
  private def variants: Seq[(String, DataFrame)] = {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    def shaped(tsCol: org.apache.spark.sql.Column) =
      base.withColumn("ts", tsCol).select(cols.map(col): _*)
    Seq(
      "nanos-long" -> shaped(col("us") * 1000L),
      "timestamp"  -> shaped(timestamp_micros(col("us"))),
      "ntz"        -> shaped(timestamp_micros(col("us")).cast(TimestampNTZType)))
  }

  test("Series.tsUs: identical epoch-micros under all three physical ts types") {
    val expected = us.sorted
    for ((label, df) <- variants) {
      val dt = df.schema("ts").dataType
      if (label == "timestamp") assert(dt == TimestampType)
      if (label == "ntz") assert(dt == TimestampNTZType)
      val got = Series.samples(df).select("ts_us").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == expected, s"[$label] ts_us drifted: $got")
    }
  }

  test("rangeBound raw-ts pushdown predicate is EXACT at the micros bounds for every type") {
    val lo = 1704067200000000L
    val hi = 1704153600000000L
    // expected: inclusive bounds keep 5 of 6 rows (drops the +1us row)
    for ((label, df) <- variants) {
      val got = TsOps.rangeBound(Series.samplesWithRaw(df), lo, hi)
        .select("ts_us").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == us.filter(u => u >= lo && u <= hi).sorted,
        s"[$label] raw-bound range drifted: $got")
    }
  }

  test("windowCounts buckets identically for every type (hour edge stays in its own window)") {
    val expected = variants.head match {
      case (_, df) => StreamIngest.windowCounts(df)
        .orderBy("window_start_ms").collect().map(_.toSeq).toSeq
    }
    for ((label, df) <- variants.drop(1)) {
      val got = StreamIngest.windowCounts(df)
        .orderBy("window_start_ms").collect().map(_.toSeq).toSeq
      assert(got == expected, s"[$label] window buckets drifted")
    }
  }

  test("the shipped testdata's ts type is one tsUs knows (sentinel for the NEXT regeneration)") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val dt = events.schema("ts").dataType
    assert(
      dt == org.apache.spark.sql.types.LongType || dt == TimestampType || dt == TimestampNTZType,
      s"events.ts regenerated with unhandled physical type $dt — extend Series.tsUs")
    // and the normalized micros land inside the Jan-2024 window the
    // graded T0..T2 constants assume
    val mm = Series.samples(events).agg(min("ts_us"), max("ts_us")).head()
    assert(mm.getLong(0) >= 1704000000000000L && mm.getLong(1) < 1706745600000000L,
      s"events ts_us range ${mm.getLong(0)}..${mm.getLong(1)} left the Jan-2024 window")
  }
}
