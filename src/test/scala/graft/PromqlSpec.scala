package graft

import org.apache.spark.sql.functions._
import graft.promql.PromQL
import graft.tsdb.{MatchEq, MatchRe, Series, TsOps}

/** The PromQL front door: parser shapes, matcher semantics, and —
  * the load-bearing property — that a parsed query evaluates to the
  * SAME result as its hand-built TsOps/DataFrame composition. */
class PromqlSpec extends SparkSpec {
  import spark.implicits._

  private val h = 3600000000000L // ns per hour
  private val hu = 3600000000L   // us per hour

  private def ev = Seq(
    (1L, 0L * h, 1L, "click", 10.0),
    (2L, 1L * h, 1L, "click", 20.0),
    (3L, 2L * h, 1L, "click", 40.0),
    (4L, 0L * h, 2L, "click", 5.0),
    (5L, 2L * h, 2L, "click", 7.0),
    (6L, 1L * h, 1L, "purchase", 100.0),
    (7L, 2L * h, 1L, "purchase", 130.0),
    (8L, 2L * h, 11L, "view", 1.0))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("parser: selectors, durations, params, by-grouping, precedence, errors") {
    val e = PromQL.parse("""sum by (event_type) (rate({event_type=~"click|view", user_id!="9"}[5m])) > 0.5""")
    e match {
      case PromQL.BinScalar(PromQL.Agg("sum", Seq("event_type"),
          PromQL.RangeFn("rate", PromQL.Selector(ms, 0L), dur, None), None), ">", 0.5) =>
        assert(dur == 5L * 60L * 1000000L)
        assert(ms == Seq(MatchRe("event_type", "click|view"),
          graft.tsdb.MatchNeq("user_id", "9")))
      case other => fail(s"unexpected AST: $other")
    }
    // trailing by-form, offset, quantile param
    PromQL.parse("""avg ({x="1"} offset 1h) by (user_id)""")
    PromQL.parse("""quantile_over_time(0.9, {a="b"}[2h])""")
    PromQL.parse("""topk(3, sum by (event_type) (count_over_time({}[1d])))""")
    intercept[IllegalArgumentException](PromQL.parse("""sum({a="b"""))
    intercept[IllegalArgumentException](PromQL.parse("""nope({a="b"}[5m])"""))
    intercept[IllegalArgumentException](PromQL.parse("""{a="b"} extra"""))
  }

  test("instant selector: latest sample within lookback, per series") {
    val out = PromQL.eval(ev, """{event_type="click"}""", 2L * hu + 1)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 40.0), (2L, 7.0))) // view/purchase filtered, latest click each
    // tight lookback excludes everything (samples are 1h apart)
    assert(PromQL.eval(ev, """{event_type="click"}""", 2L * hu + 1000000, 1000L).count() == 0)
  }

  test("range functions match their hand-built compositions") {
    val at = 2L * hu
    val sm = Series.samples(ev).filter(col("event_type") === "click")
      .filter(col("ts_us") >= at - 2L * hu && col("ts_us") <= at)
    // sum_over_time == decimal-exact per-series sums
    val got = PromQL.eval(ev, """sum_over_time({event_type="click"}[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 70.0), (2L, 12.0)))
    // rate == the TsOps.rate estimator on the same window
    val viaOp = TsOps.rate(sm).select(col("series_id"), col("rate_per_sec"))
      .as[(String, Double)].collect().toMap
    val viaQL = PromQL.eval(ev, """rate({event_type="click"}[2h])""", at)
      .select("series_id", "value").as[(String, Double)].collect().toMap
    assert(viaQL == viaOp)
  }

  test("aggregation, topk, scalar math, comparison filter") {
    val at = 2L * hu
    // sum by (event_type) of count_over_time == groupBy count
    val g = PromQL.eval(ev, """sum by (event_type) (count_over_time({}[2h]))""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(g == Map("click" -> 5.0, "purchase" -> 2.0, "view" -> 1.0))
    // topk(1, ...) picks the biggest series; tiebreak is total-ordered
    val top = PromQL.eval(ev, """topk(1, sum_over_time({event_type="click"}[2h]))""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(top == Seq((1L, 70.0)))
    // scalar chain is left-associative; comparison drops samples
    val filtered = PromQL.eval(ev,
      """sum by (event_type) (count_over_time({}[2h])) * 10 > 15""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(filtered == Map("click" -> 50.0, "purchase" -> 20.0))
    // global quantile across series (R-7, rounded 6dp)
    val q = PromQL.eval(ev, """quantile(0.5, count_over_time({event_type="click"}[2h]))""", at)
      .select("value").as[Double].collect().head
    assert(q == 2.5) // series counts [2, 3]
  }

  test("vector-vector binary op with on(...) matching — the ratio shape") {
    val at = 2L * hu
    val out = PromQL.eval(ev,
      """count_over_time({event_type="purchase"}[2h]) / on (user_id) count_over_time({event_type="click"}[2h])""",
      at)
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    // user 1: 2 purchases / 3 clicks; user 2 has no purchases → dropped
    assert(out == Seq((1L, 2.0 / 3)))
    // default matching = shared label set (series identity): purchase
    // and click series never share a series_id → empty result
    assert(PromQL.eval(ev,
      """count_over_time({event_type="purchase"}[2h]) / count_over_time({event_type="click"}[2h])""",
      at).count() == 0)
  }

  test("offset shifts the evaluation window") {
    val at = 2L * hu
    // offset 1h at t=2h == evaluating at t=1h: only samples <= 1h
    val out = PromQL.eval(ev, """max_over_time({event_type="click"}[2h] offset 1h)""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 20.0), (2L, 5.0)))
  }

  test("a parsed dashboard query plans with matcher pushdown (no post-hoc filtering of the full corpus)") {
    val df = PromQL.eval(spark.read.parquet(s"$sfDir/events.parquet"),
      """sum by (event_type) (sum_over_time({event_type=~"click|purchase"}[7d]))""",
      1705708800000000L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("Filter"), plan.take(600))
    assert(!plan.contains("SortAggregate"), "promql agg fell out of HashAggregate")
  }
}
