package graft

import org.apache.spark.sql.functions._

import graft.tsdb.{MatchEq, MatchNre, MatchRe, Series, TsOps}

/** Third-label-column probe (r11 verdict, What's-missing #3): the wire
  * layer always carried arbitrary label MAPs, but the gated sample
  * frame bound {event_type, user_id} — so a hidden 2-label assumption
  * anywhere in the matcher/catalog/PromQL stack would surface only
  * when a corpus grew a third label. This spec synthesizes that corpus
  * and drives the stack over it. */
class ThreeLabelSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1704067200000000L // us

  /** 3-label corpus: (event_type, region, user_id) × hourly samples. */
  private lazy val events = {
    val rows = for {
      (et, base) <- Seq("click" -> 1.0, "view" -> 10.0)
      region <- Seq("eu", "us")
      uid <- Seq(1L, 2L)
      i <- 0 until 6
    } yield (
      et.hashCode.toLong * 1000 + region.hashCode + uid * 7 + i,
      (t0 + i * 600000000L) * 1000, // ns
      uid, et, region, base + i)
    rows.toDF("event_id", "ts", "user_id", "event_type", "region", "value")
  }
  private val labels3 = Seq("event_type", "region", "user_id")

  test("samplesLabeled: 3-label identity matches the wire layer's MAP hash and the canonical string") {
    val s = Series.samplesLabeled(events, labels3)
    assert(s.columns.toSeq ==
      Seq("series_id", "event_type", "region", "user_id", "ts_us", "value", "event_id"))
    // identity equals md5 of the sorted k=v join …
    val viaString = events.select(
      md5(concat(lit("event_type="), col("event_type"),
        lit(",region="), col("region"),
        lit(",user_id="), col("user_id").cast("string"))).as("want"),
      col("event_id"))
    val joined = s.join(viaString, "event_id")
      .filter(col("series_id") =!= col("want")).count()
    assert(joined == 0, "canonical 3-label id diverged from the sorted k=v md5")
    // … and equals RemoteWrite.seriesIdOfLabels over the SAME MAP —
    // the wire layer and the frame layer must agree on identity at
    // every arity, or a remote-written series forks from its local twin
    val viaMap = events.select(
      graft.sources.RemoteWrite.seriesIdOfLabels(
        map(lit("event_type"), col("event_type"),
          lit("region"), col("region"),
          lit("user_id"), col("user_id").cast("string"))).as("want"),
      col("event_id"))
    assert(s.join(viaMap, "event_id")
      .filter(col("series_id") =!= col("want")).count() == 0,
      "frame identity diverged from the wire MAP identity")
    // 8 distinct series: 2 event types × 2 regions × 2 users
    assert(Series.catalogLabeled(events, labels3).count() == 8)
  }

  test("matchers on the third label: EQ/RE/NRE prune series exactly") {
    val s = Series.samplesLabeled(events, labels3)
    val eu = TsOps.rangeQuery(s, Seq(MatchEq("region", "eu")), t0, t0 + 3600000000L)
    assert(eu.count() == 24) // 2 et × 2 uid × 6 samples
    // full-anchor RE semantics hold on the new label too
    assert(TsOps.rangeQuery(s, Seq(MatchRe("region", "e.+")), t0, t0 + 3600000000L)
      .count() == 24)
    assert(TsOps.rangeQuery(s, Seq(MatchRe("region", "u")), t0, t0 + 3600000000L)
      .count() == 0) // anchored: "u" does not match "us"
    val mixed = TsOps.rangeQuery(s,
      Seq(MatchEq("event_type", "click"), MatchNre("region", "eu"), MatchEq("user_id", "1")),
      t0, t0 + 3600000000L)
    assert(mixed.count() == 6)
    assert(mixed.select("series_id").distinct().count() == 1)
  }

  test("PromQL over 3 labels: selector matchers, by-grouping and range functions derive arity from the frame") {
    import graft.promql.PromQL
    val at = t0 + 3000000000L // 50min: the last sample, inside the 5m lookback
    // instant selector keeps ALL THREE label columns in the vector
    val v = PromQL.evalLabeled(events, labels3, """{region="eu"}""", at)
    assert(v.columns.toSeq.take(4) ==
      Seq("series_id", "event_type", "region", "user_id"))
    assert(v.count() == 4) // 2 et × 2 uid in eu, latest sample each
    // grouping BY the third label — the aggregation the 2-label stack
    // could never have expressed
    val byRegion = PromQL.evalLabeled(events, labels3,
      """sum by (region) (count_over_time({event_type="click"}[1h]))""", at)
      .select("region", "value").as[(String, Double)].collect().toMap
    assert(byRegion == Map("eu" -> 12.0, "us" -> 12.0),
      s"by(region) grouping broke: $byRegion")
    // a range function + binary op across the grid, 3-label frame
    val ratio = PromQL.evalRangeLabeled(events, labels3,
      """sum by (region) (sum_over_time({event_type="view"}[30m]))""",
      t0 + 1800000000L, at, 600000000L)
    assert(ratio.count() == 6) // 2 regions × 3 grid instants
    // matcher on region INSIDE the range selector prunes before the agg
    val euOnly = PromQL.evalLabeled(events, labels3,
      """count(count_over_time({region="eu"}[1h]))""", at)
      .select("value").as[Double].head()
    assert(euOnly == 4.0, s"region matcher inside range selector: $euOnly")
  }

  test("the 2-label gated frame is the same code path (samples delegates)") {
    val ev2 = events.drop("region")
    val a = Series.samples(ev2).select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = Series.samplesLabeled(ev2, Seq("event_type", "user_id"))
      .select("series_id", "ts_us", "value")
      .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a == b)
  }
}
