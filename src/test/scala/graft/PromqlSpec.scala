package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.promql.PromQL
import graft.tsdb.{MatchEq, MatchRe, Series, TsOps}

/** The PromQL front door: parser shapes, matcher semantics, and —
  * the load-bearing property — that a parsed query evaluates to the
  * SAME result as its hand-built TsOps/DataFrame composition, and
  * that a RANGE query's one-plan grid evaluation equals the instant
  * evaluation at every grid point. */
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
      case PromQL.BinScalar(PromQL.Agg("sum", Seq("event_type"), false,
          PromQL.RangeFn("rate", PromQL.Selector(ms, 0L, None), dur, None, None), None), ">", 0.5, false, false) =>
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
    intercept[IllegalArgumentException](PromQL.parse("""nope2 3({a="b"}[5m])"""))
    intercept[IllegalArgumentException](PromQL.parse("""{a="b"} extra"""))
  }

  test("parser: bare metric names desugar to event_type matchers") {
    assert(PromQL.parse("""click{user_id="1"}""") ==
      PromQL.parse("""{event_type="click", user_id="1"}"""))
    assert(PromQL.parse("""rate(click[5m])""") ==
      PromQL.parse("""rate({event_type="click"}[5m])"""))
    assert(PromQL.parse("""click offset 1h""") ==
      PromQL.Selector(Seq(MatchEq("event_type", "click")), hu))
  }

  test("parser: operator precedence ladder and constant folding") {
    // * binds tighter than +: a + b*2 = a + (b*2)
    PromQL.parse("""{a="1"} + {b="2"} * 2""") match {
      case PromQL.BinVec(PromQL.Selector(_, _, _), "+", PromQL.VecMatch(Nil, Nil, 0, false, Nil),
          PromQL.BinScalar(PromQL.Selector(_, _, _), "*", 2.0, false, false), false) => ()
      case other => fail(s"precedence broke: $other")
    }
    // comparisons bind looser than arithmetic
    PromQL.parse("""{a="1"} * 2 > 3""") match {
      case PromQL.BinScalar(PromQL.BinScalar(_, "*", 2.0, false, false), ">", 3.0, false, false) => ()
      case other => fail(s"precedence broke: $other")
    }
    // scalar-scalar folds; scalar on the left is marked
    assert(PromQL.parse("""{a="1"} * (2 + 3)""") ==
      PromQL.BinScalar(PromQL.Selector(Seq(MatchEq("a", "1"))), "*", 5.0))
    PromQL.parse("""1 - {a="1"}""") match {
      case PromQL.BinScalar(_, "-", 1.0, true, false) => ()
      case other => fail(s"scalar-left lost: $other")
    }
    // and/unless bind looser than comparison, or loosest
    PromQL.parse("""{a="1"} > 1 and {b="2"} or {c="3"}""") match {
      case PromQL.BinVec(PromQL.BinVec(PromQL.BinScalar(_, ">", 1.0, false, false),
          "and", PromQL.VecMatch(Nil, Nil, 0, false, Nil), _, false), "or", PromQL.VecMatch(Nil, Nil, 0, false, Nil), _, false) => ()
      case other => fail(s"set-op precedence broke: $other")
    }
    // bool modifier on comparisons
    PromQL.parse("""{a="1"} > bool 1""") match {
      case PromQL.BinScalar(_, ">", 1.0, false, true) => ()
      case other => fail(s"bool lost: $other")
    }
    // without aggregation modifier
    PromQL.parse("""sum without (user_id) (click)""") match {
      case PromQL.Agg("sum", Seq("user_id"), true, _, None) => ()
      case other => fail(s"without lost: $other")
    }
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

  test("new range functions: delta, irate, idelta, resets, changes, present/absent_over_time") {
    val at = 2L * hu
    // delta = last - first per series (user 1: 40-10, user 2: 7-5)
    val d = PromQL.eval(ev, """delta(click[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(d == Seq((1L, 30.0), (2L, 2.0)))
    // irate = rate of the LAST TWO samples (user 1: (40-20)/3600; user 2
    // has its two samples 2h apart: (7-5)/7200)
    val ir = PromQL.eval(ev, """irate(click[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toMap
    assert(math.abs(ir(1L) - 20.0 / 3600) < 1e-12)
    assert(math.abs(ir(2L) - 2.0 / 7200) < 1e-12)
    // idelta = last-two value difference
    val id = PromQL.eval(ev, """idelta(click[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(id == Seq((1L, 20.0), (2L, 2.0)))
    // a counter that resets once and changes twice
    val rev = Seq(
      (1L, 0L * h, 1L, "c", 10.0), (2L, 1L * h, 1L, "c", 4.0),
      (3L, 2L * h, 1L, "c", 4.0), (4L, 3L * h, 1L, "c", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rs = PromQL.eval(rev, """resets({event_type="c"}[3h])""", 3L * hu)
      .select("value").as[Double].collect().toSeq
    assert(rs == Seq(1.0))
    val ch = PromQL.eval(rev, """changes({event_type="c"}[3h])""", 3L * hu)
      .select("value").as[Double].collect().toSeq
    assert(ch == Seq(2.0))
    // window clipping: at t=3h with a 2h window, the pair (0h→1h) falls
    // outside — only in-window adjacencies count
    val rs2 = PromQL.eval(rev, """resets({event_type="c"}[2h])""", 3L * hu)
      .select("value").as[Double].collect().toSeq
    assert(rs2 == Seq(0.0))
    // presence
    assert(PromQL.eval(ev, """present_over_time(view[2h])""", at)
      .select("value").as[Double].collect().toSeq == Seq(1.0))
    assert(PromQL.eval(ev, """absent_over_time(nosuch[2h])""", at)
      .select("value").as[Double].collect().toSeq == Seq(1.0))
    assert(PromQL.eval(ev, """absent_over_time(view[2h])""", at).count() == 0)
  }

  test("deriv and predict_linear match the linreg moments") {
    val at = 2L * hu
    // user 1 clicks: (0h,10) (1h,20) (2h,40) — least-squares slope
    // over x in seconds: slope = cov/var = 15/3600^2... compute directly
    val xs = Seq(0.0, 3600.0, 7200.0); val ys = Seq(10.0, 20.0, 40.0)
    val n = 3.0
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val dv = PromQL.eval(ev, """deriv({event_type="click", user_id="1"}[2h])""", at)
      .select("value").as[Double].collect().head
    assert(math.abs(dv - slope) < 1e-12)
    // predict_linear at +1h: mean + slope * (x_eval - x_bar),
    // x_eval = window seconds + horizon
    val pv = PromQL.eval(ev, """predict_linear({event_type="click", user_id="1"}[2h], 3600)""", at)
      .select("value").as[Double].collect().head
    val expect = sy / n + slope * ((7200.0 + 3600.0) - sx / n)
    assert(math.abs(pv - expect) < 1e-9)
  }

  test("review fixes: unary-minus precedence, durations, scalar set ops, IEEE arithmetic, topk by, or with on(), empty on()") {
    val at = 2L * hu
    // unary minus binds looser than ^ (PromQL: -2^2 = -4)
    assert(PromQL.parse("-2^2") == PromQL.ScalarLit(-4.0))
    // ms + compound duration literals, shared with the HTTP layer
    PromQL.parse("""count_over_time({a="b"}[1h30m])""") // lexes as one duration
    assert(PromQL.parseDuration("1h30m") == 5400000000L)
    assert(PromQL.parseDuration("500ms") == 500000L)
    intercept[IllegalArgumentException](PromQL.parseDuration("1m30"))
    // set ops between scalars are a typed error, not a MatchError
    intercept[IllegalArgumentException](PromQL.parse("1 and 2"))
    // IEEE arithmetic under Spark's ANSI mode: /0 is ±Inf/NaN, %0 NaN,
    // ln(0) -Inf, ln(<0) NaN — never a SparkArithmeticException
    def one(q: String): Double =
      PromQL.eval(ev, q, at).select("value").as[Double].collect().head
    assert(one("""sum(count_over_time({}[2h])) / 0""").isPosInfinity)
    assert(one("""(0 - sum(count_over_time({}[2h]))) / 0""").isNegInfinity)
    assert(one("""sum(count_over_time({}[2h])) % 0""").isNaN)
    assert(one("""ln(sum(count_over_time({}[2h])) - 8)""").isNegInfinity)
    assert(one("""ln(0 - sum(count_over_time({}[2h])))""").isNaN)
    // topk honors the grouping clause: one winner per event_type
    val t1 = PromQL.eval(ev, """topk(1, count_over_time({}[2h])) by (event_type)""", at)
      .select("event_type", "value").as[(String, Double)].collect().sortBy(_._1).toSeq
    assert(t1 == Seq(("click", 3.0), ("purchase", 2.0), ("view", 1.0)))
    // or honors on(): purchase's user 1 collides with a click user
    assert(PromQL.eval(ev,
      """count_over_time(click[2h]) or on (user_id) count_over_time(purchase[2h])""", at)
      .select("event_type").as[String].collect().toSet == Set("click"))
    // ...but view's user 11 has no purchase collision → both survive
    assert(PromQL.eval(ev,
      """count_over_time(purchase[2h]) or on (user_id) count_over_time(view[2h])""", at)
      .select("event_type").as[String].collect().toSet == Set("purchase", "view"))
    // explicit on() = match on no labels: share of the GLOBAL total
    val shares = PromQL.eval(ev,
      """count_over_time({}[2h]) / on () group_left sum (count_over_time({}[2h]))""", at)
      .select("event_type", "user_id", "value").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(shares == Seq(("click", 1L, 3.0 / 8), ("click", 2L, 2.0 / 8),
      ("purchase", 1L, 2.0 / 8), ("view", 11L, 1.0 / 8)))
  }

  test("holt_winters, stdvar_over_time, stddev/stdvar/group aggregators") {
    val at = 2L * hu
    // holt_winters hand-fold: u1 clicks (10,20,40) sf=tf=0.5 →
    // s=10,b=10; x=20: s'=20,b'=10; x=40: s'=0.5*40+0.5*30=35
    // u2 clicks (5,7): s=5,b=2; x=7: s'=0.5*7+0.5*7=7
    val hw = PromQL.eval(ev, """holt_winters(click[2h], 0.5, 0.5)""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(hw == Seq((1L, 35.0), (2L, 7.0)))
    // single-sample series drop (view has 1 sample), like Prometheus
    assert(PromQL.eval(ev, """holt_winters(view[2h], 0.5, 0.5)""", at).count() == 0)
    intercept[IllegalArgumentException](PromQL.parse("""holt_winters(v[1h], 1.5, 0.5)"""))
    // stdvar_over_time = stddev_over_time squared (u1 clicks var:
    // E[x^2]-E[x]^2 over 10,20,40 = 700/3... use exact: 2100/3 - (70/3)^2)
    val sv = PromQL.eval(ev, """stdvar_over_time({event_type="click", user_id="1"}[2h])""", at)
      .select("value").as[Double].collect().head
    val sd = PromQL.eval(ev, """stddev_over_time({event_type="click", user_id="1"}[2h])""", at)
      .select("value").as[Double].collect().head
    assert(math.abs(sv - sd * sd) < 1e-9)
    // cross-series aggregators: stddev/stdvar over series counts [3,2]
    // per click type; group collapses to 1
    val sdev = PromQL.eval(ev, """stddev by (event_type) (count_over_time(click[2h]))""", at)
      .select("value").as[Double].collect().head
    assert(math.abs(sdev - 0.5) < 1e-12) // counts 3 and 2 → stddev 0.5
    val svar = PromQL.eval(ev, """stdvar by (event_type) (count_over_time(click[2h]))""", at)
      .select("value").as[Double].collect().head
    assert(math.abs(svar - 0.25) < 1e-12)
    val grp = PromQL.eval(ev, """group by (event_type) (count_over_time({}[2h]))""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(grp == Map("click" -> 1.0, "purchase" -> 1.0, "view" -> 1.0))
  }

  test("label functions: label_replace, label_join, count_values") {
    val at = 2L * hu
    // label_replace: full-match rewrites, non-match keeps the old dst
    val lr = PromQL.eval(ev,
      """label_replace(count_over_time({}[2h]), "kind", "$1ing", "event_type", "(click|view)")""", at)
      .select("event_type", "kind").as[(String, String)].collect().toSet
    assert(lr == Set(("click", "clicking"), ("view", "viewing"), ("purchase", "")))
    // label_join concatenates existing labels into a new one
    val lj = PromQL.eval(ev,
      """label_join(count_over_time(purchase[2h]), "uid", "-", "event_type", "user_id")""", at)
      .select("uid").as[String].collect().toSeq
    assert(lj == Seq("purchase-1"))
    // the new label participates in matching downstream
    val m = PromQL.eval(ev,
      """sum by (kind) (label_replace(count_over_time({}[2h]), "kind", "engage", "event_type", "click|view"))""", at)
      .select("kind", "value").as[(String, Double)].collect().toMap
    assert(m == Map("engage" -> 6.0, "" -> 2.0))
    // count_values: the value becomes a label, output = occurrences
    val cv = PromQL.eval(ev, """count_values("n", count_over_time({}[2h]))""", at)
      .select("n", "value").as[(String, Double)].collect().toMap
    // series counts: click-u1 3, click-u2 2, purchase 2, view 1
    assert(cv == Map("3.0" -> 1.0, "2.0" -> 2.0, "1.0" -> 1.0))
    // reserved destinations refuse
    intercept[IllegalArgumentException](PromQL.eval(ev,
      """count_values("value", count_over_time({}[2h]))""", at))
  }

  test("@ modifier pins a selector's evaluation instant") {
    val at = 2L * hu
    // parse shapes (selector-level and after-the-bracket spellings)
    PromQL.parse("""click @ 3600""") match {
      case PromQL.Selector(_, 0L, Some(p)) => assert(p == hu)
      case other => fail(s"@ lost: $other")
    }
    PromQL.parse("""rate(click[5m] @ 3600)""") match {
      case PromQL.RangeFn("rate", PromQL.Selector(_, 0L, Some(p)), _, None, None) =>
        assert(p == hu)
      case other => fail(s"@ lost on range vector: $other")
    }
    // pinned evaluation ignores the outer instant: @1h at t=2h equals
    // the unpinned evaluation at t=1h
    val pinned = PromQL.eval(ev, """sum_over_time(click[2h] @ 3600)""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val direct = PromQL.eval(ev, """sum_over_time(click[2h])""", 1L * hu)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(pinned == direct && pinned == Seq((1L, 30.0), (2L, 5.0)))
    // over a range grid, a pinned vector is constant at every instant;
    // the ratio-to-fixed-baseline shape works
    val r = PromQL.evalRange(ev,
      """sum_over_time(click[1h]) / on (user_id) sum_over_time(click[1h] @ 3600)""",
      1L * hu, 2L * hu, hu)
      .select("ts_us", "user_id", "value").as[(Long, Long, Double)]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    // u1 baseline @1h = 30 (10+20): t=1h 30/30=1, t=2h (20+40)/30=2;
    // u2 baseline = 5 (the 0h sample): t=1h 5/5=1, t=2h 7/5=1.4
    assert(r == Seq((1L * hu, 1L, 1.0), (1L * hu, 2L, 1.0),
      (2L * hu, 1L, 2.0), (2L * hu, 2L, 1.4)))
  }

  test("r9 review fixes: @ on subqueries threads, vector-scalar rejects matching, topk k >= 0, descending duration units") {
    // `@` after subquery brackets is THREADED, not silently dropped:
    // pinned at 2h, evaluated at 4h == unpinned evaluated at 2h
    PromQL.parse("""max_over_time(rate(click[5m])[1h:10m] @ 7200)""") match {
      case PromQL.SubqueryFn("max_over_time", _, _, _, 0L, None, None, Some(p)) =>
        assert(p == 2L * hu)
      case other => fail(s"@ lost on subquery: $other")
    }
    val pinned = PromQL.eval(ev,
      """max_over_time(sum_over_time(click[1h])[2h:1h] @ 7200)""", 4L * hu)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val direct = PromQL.eval(ev,
      """max_over_time(sum_over_time(click[1h])[2h:1h])""", 2L * hu)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(pinned == direct && pinned == Seq((1L, 60.0), (2L, 7.0)))
    // vector matching on vector-scalar ops is a typed parse error
    // (Prometheus rejects it; dropping the modifier would be silent)
    intercept[IllegalArgumentException](PromQL.parse("""click / on(user_id) 2"""))
    intercept[IllegalArgumentException](PromQL.parse("""2 * ignoring(user_id) click"""))
    intercept[IllegalArgumentException](PromQL.parse("""1 + on(x) 2"""))
    // negative k rejects at parse time (400), not as an opaque run-time
    // Spark error (500); quantile's negative φ stays legal (NaN result)
    intercept[IllegalArgumentException](PromQL.parse("""topk(-3, click)"""))
    intercept[IllegalArgumentException](PromQL.parse("""bottomk(-1, click)"""))
    PromQL.parse("""quantile(-0.5, click)""")
    // compound durations need strictly descending unique units
    intercept[IllegalArgumentException](PromQL.parseDuration("1m1h"))
    intercept[IllegalArgumentException](PromQL.parseDuration("5s5s"))
    assert(PromQL.parseDuration("1h30m5s") == 5405000000L)
  }

  test("r9 function batch: trig/pi, date parts, sort, timestamp, @ start()/end()") {
    val at = 2L * hu
    def vals(q: String): Seq[Double] =
      PromQL.eval(ev, q, at).select("value").as[Double].collect().sorted.toSeq
    // trig + pi + deg/rad ride the scalar ladder
    assert(vals("""sin(count_over_time(click[30m]))""") == Seq(math.sin(1.0), math.sin(1.0)))
    assert(vals("""deg(count_over_time(click[30m]))""") == Seq(math.toDegrees(1.0), math.toDegrees(1.0)))
    assert(vals("""pi() * count_over_time(click[30m])""") == Seq(math.Pi, math.Pi))
    assert(PromQL.parse("pi()") == PromQL.ScalarLit(math.Pi))
    // date parts interpret values as unix seconds (UTC): click sums
    // scaled to whole days — epoch day n has dow (4 + n) mod 7
    val dow = PromQL.eval(ev, """day_of_week(sum_over_time(click[2h]) * 86400)""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(dow == Seq((1L, ((4 + 70) % 7).toDouble), (2L, ((4 + 12) % 7).toDouble)), dow)
    assert(vals("""days_in_month(click * 86400)""") == Seq(28.0, 31.0)) // day 40 = Feb, day 10 = Jan
    assert(vals("""year(click)""") == Seq(1970.0, 1970.0))
    // timestamp(sel): the winning sample's OWN time, seconds
    assert(vals("""timestamp(click)""") == Seq(7200.0, 7200.0))
    // at the 1h pin only u1 has a sample inside the 5m lookback
    assert(vals("""timestamp(click @ 3600)""") == Seq(3600.0))
    // sort/sort_desc: presentation order survives collect
    val sd = PromQL.eval(ev, """sort_desc(sum_over_time(click[2h]))""", at)
      .select("value").as[Double].collect().toSeq
    assert(sd == Seq(70.0, 12.0), sd)
    assert(PromQL.eval(ev, """sort(sum_over_time(click[2h]))""", at)
      .select("value").as[Double].collect().toSeq == Seq(12.0, 70.0))
    // @ start() / @ end() resolve against the evaluation range: on the
    // [1h, 2h] grid the pinned vector is constant at the bound's value
    val r = PromQL.evalRange(ev, """sum_over_time(click[1h] @ start())""", 1L * hu, 2L * hu, hu)
      .select("ts_us", "user_id", "value").as[(Long, Long, Double)]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(r == Seq((hu, 1L, 30.0), (hu, 2L, 5.0), (2L * hu, 1L, 30.0), (2L * hu, 2L, 5.0)), r)
    val re = PromQL.evalRange(ev, """sum_over_time(click[1h] @ end())""", 1L * hu, 2L * hu, hu)
      .select("ts_us", "user_id", "value").as[(Long, Long, Double)]
      .collect().sortBy(x => (x._1, x._2)).toSeq
    assert(re == Seq((hu, 1L, 60.0), (hu, 2L, 7.0), (2L * hu, 1L, 60.0), (2L * hu, 2L, 7.0)), re)
    // instant query: start = end = the instant, so the pin is a no-op
    assert(vals("""sum_over_time(click[2h] @ start())""") == vals("""sum_over_time(click[2h])"""))
    // timestamp over a non-selector refuses typed
    intercept[IllegalArgumentException](
      PromQL.eval(ev, """timestamp(sum(click))""", at))
    // time(): the evaluation instant as a per-instant scalar; 2h into
    // 1970-01-01 is a Thursday (dow 4)
    assert(vals("""day_of_week(vector(time()))""") == Seq(4.0))
    assert(vals("""click - time()""").sorted == Seq(7.0 - 7200, 40.0 - 7200).sorted)
    // on a range grid time() varies per instant
    val ht = PromQL.evalRange(ev, """hour(vector(time()))""", 0L, 3L * hu, hu)
      .select("ts_us", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(ht == Seq((0L, 0.0), (hu, 1.0), (2L * hu, 2.0), (3L * hu, 3.0)), ht)
    // staleness seconds: time() - timestamp(sel)
    assert(vals("""time() - timestamp(click)""") == Seq(0.0, 0.0))
  }

  test("histogram_quantile: interpolated quantile over an le-labeled bucket vector") {
    val at = 2L * hu
    def one(q: String): Seq[(String, Double)] =
      PromQL.eval(ev, q, at).collect().map(r =>
        (r.schema.fieldNames.filterNot(_ == "value").map(n => r.get(r.fieldIndex(n)).toString).mkString(","),
          r.getDouble(r.fieldIndex("value")))).toSeq.sortBy(_._1)
    // sum_over_time(click[2h]) @ 2h: u1 = 70, u2 = 12 → buckets
    // {12: 1 series, 70: 1 series}, total 2. φ=0.5 → rank 1 crosses
    // the first bucket (lower edge 0): 0 + 12·(1−0)/1 = 12
    val q = """histogram_quantile(%s, count_values("le", sum_over_time(click[2h])))"""
    assert(one(q.format("0.5")).map(_._2) == Seq(12.0))
    // φ=0.75 → rank 1.5 crosses the 70-bucket: 12 + 58·0.5/1 = 41
    assert(one(q.format("0.75")).map(_._2) == Seq(41.0))
    // φ=1 → the highest bound; φ=0 → the lowest bucket's lower edge
    assert(one(q.format("1")).map(_._2) == Seq(70.0))
    assert(one(q.format("0")).map(_._2) == Seq(0.0))
    // out-of-range φ, Prometheus edges
    assert(one(q.format("-1")).map(_._2) == Seq(Double.NegativeInfinity))
    assert(one(q.format("2")).map(_._2) == Seq(Double.PositiveInfinity))
    // count_values' by-clause keeps labels as group keys: per-type
    // medians — click crosses at 12, purchase (one 230-bucket) at
    // 0 + 230·0.5 = 115, view at 1·0.5 = 0.5
    val byType = PromQL.eval(ev,
      """histogram_quantile(0.5, count_values by (event_type) ("le", sum_over_time({}[2h])))""",
      at).select("event_type", "value").as[(String, Double)].collect().sortBy(_._1).toSeq
    assert(byType == Seq(("click", 12.0), ("purchase", 115.0), ("view", 0.5)))
    // +Inf is the overflow bucket: a quantile crossing into it reports
    // the highest FINITE bound (click@2h: u1 40/(40−7)=1.212121…,
    // u2 7/0=+Inf; φ=0.9 → rank 1.8 lands in the Inf bucket)
    val inf = PromQL.eval(ev,
      """histogram_quantile(0.9, count_values("le", click / (click - 7)))""", at)
      .select("value").as[Double].collect().toSeq
    assert(inf == Seq(math.floor(40.0 / 33.0 * 1e6 + 0.5) / 1e6))
    // graceful refusal on a non-conforming vector (no le label)
    val e = intercept[IllegalArgumentException](
      PromQL.eval(ev, """histogram_quantile(0.5, click)""", at))
    assert(e.getMessage.contains("le"))
  }

  test("histogram_quantile_cum: Prometheus cumulative *_bucket convention — differencing, monotonic repair, NaN without +Inf") {
    val at = 2L * hu
    // bucket series encoded as user_id = upper bound (99 ↦ +Inf via
    // label_replace), value = CUMULATIVE count at the instant — the
    // exact shape a scrape client hands back from *_bucket series
    val buckets = Seq(
      // well-formed: cum [1→2, 3→4, Inf→5] = dense [2, 2, 1]
      (1L, 2L * h, 1L, "cum_ok", 2.0),
      (2L, 2L * h, 3L, "cum_ok", 4.0),
      (3L, 2L * h, 99L, "cum_ok", 5.0),
      // highest bucket is NOT +Inf → Prometheus answers NaN
      (4L, 2L * h, 1L, "cum_noinf", 2.0),
      (5L, 2L * h, 3L, "cum_noinf", 4.0),
      // counter-reset dip: cum [1→4, 3→2, Inf→5] monotonizes to
      // [4, 4, 5] = dense [4, 0, 1] (the ensureMonotonic repair)
      (6L, 2L * h, 1L, "cum_dip", 4.0),
      (7L, 2L * h, 3L, "cum_dip", 2.0),
      (8L, 2L * h, 99L, "cum_dip", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def q(metric: String, phi: String = "0.5"): String =
      s"""histogram_quantile_cum($phi, sum by (le) (label_replace(label_replace($metric, "le", "$$1", "user_id", "(.*)"), "le", "Inf", "le", "99")))"""
    def one(query: String): Seq[Double] =
      PromQL.eval(buckets, query, at).select("value").as[Double].collect().toSeq
    // rank 2.5 of 5 crosses the 3-bucket: 1 + (3−1)·(2.5−2)/2 = 1.5 —
    // equal to histogram_quantile over the equivalent DENSE buckets
    assert(one(q("cum_ok")) == Seq(1.5))
    // feeding the same cumulative data to the DENSE spelling
    // double-cumsums (the silent corruption the split spelling
    // prevents): 2/6/11 ≠ 2/4/5 — assert they disagree
    val dense = PromQL.eval(buckets,
      q("cum_ok").replace("histogram_quantile_cum", "histogram_quantile"), at)
      .select("value").as[Double].collect().toSeq
    assert(dense != Seq(1.5), s"dense spelling must not equal cum on cumulative input, got $dense")
    // no +Inf overflow bucket → NaN, as Prometheus
    val noinf = one(q("cum_noinf"))
    assert(noinf.size == 1 && noinf.head.isNaN, noinf)
    // dip repaired by running max: dense [4,0,1], rank 2.5 in the
    // first bucket: 0 + 1·2.5/4 = 0.625
    assert(one(q("cum_dip")) == Seq(0.625))
    // out-of-range φ keeps the Prometheus edges even for cum
    assert(one(q("cum_ok", "2")) == Seq(Double.PositiveInfinity))
  }

  test("recordRule: recorded series are first-class metrics, colon names parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft_record").toString
    val store = new graft.tsdb.ChunkStore(spark, dir, chunkMs = 86400000L)
    val ruleStore = new graft.tsdb.ChunkStore(spark,
      java.nio.file.Files.createTempDirectory("graft_record_dst").toString,
      chunkMs = 86400000L)
    store.append(graft.tsdb.Series.samples(ev))
    val n = PromQL.recordRule(store, ruleStore, "type:value:sum2h",
      """sum by (event_type) (sum_over_time({}[2h]))""",
      hu, 2L * hu, hu)
    assert(n > 0)
    // the recorded metric selects by BARE COLON NAME (the recording-
    // rule convention — the lexer must take ':' in identifiers) and
    // composes into further expressions like any ingested series
    val got = PromQL.evalStore(ruleStore, """sum(type:value:sum2h)""", 2L * hu)
      .select("value").as[Double].collect().toSeq
    // at 2h: the store's ingest guard drops the ts=0 samples (non-
    // positive timestamps), so click = 20+40+7 = 67, purchase 230,
    // view 1 → 298
    assert(got == Seq(298.0), got)
    // labels survive as user_id (the surviving group value)
    val byLabel = PromQL.evalStore(ruleStore,
      """type:value:sum2h{user_id="purchase"}""", 2L * hu)
      .select("value").as[Double].collect().toSeq
    assert(byLabel == Seq(230.0), byLabel)
    // the subquery colon still lexes as the symbol after a duration
    PromQL.parse("""max_over_time(sum(click)[2h:1h])""")
  }

  test("subqueries: inner expr on an epoch-aligned step grid, outer range fn over it") {
    // parser shape
    PromQL.parse("""max_over_time(rate(click[5m])[1h:10m])""") match {
      case PromQL.SubqueryFn("max_over_time",
          PromQL.RangeFn("rate", _, _, None, None), r, st, 0L, None, None, None) =>
        assert(r == 3600000000L && st == 600000000L)
      case other => fail(s"subquery AST broke: $other")
    }
    // a non-selector range vector without a subquery step is an error
    intercept[IllegalArgumentException](PromQL.parse("""rate(sum(click)[5m])"""))

    val at = 2L * hu
    // inner sum_over_time(click[1h]) at u ∈ {0, 1h, 2h} (epoch-aligned):
    // u1: 10, 30, 60; u2: 5, 5, 7 → outer max per series
    val m = PromQL.eval(ev, """max_over_time(sum_over_time(click[1h])[2h:1h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(m == Seq((1L, 60.0), (2L, 7.0)))
    // aggregated inner: labels become the aggregation's by-set
    val a = PromQL.eval(ev,
      """max_over_time(sum by (event_type) (count_over_time({}[1h]))[2h:1h])""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(a == Map("click" -> 3.0, "purchase" -> 2.0, "view" -> 1.0))
    // holt_winters over a subquery threads BOTH factors through
    // (inner sums u1: 10,30,60 → fold with sf=tf=0.5 gives 55;
    // u2: 5,5,7 → 6)
    val hwSub = PromQL.eval(ev,
      """holt_winters(sum_over_time(click[1h])[2h:1h], 0.5, 0.5)""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(hwSub == Seq((1L, 55.0), (2L, 6.0)))
    // avg over the subquery instants (u1 clicks: (10+30+60)/3)
    val av = PromQL.eval(ev,
      """avg_over_time(sum_over_time({event_type="click", user_id="1"}[1h])[2h:1h])""", at)
      .select("value").as[Double].collect().toSeq
    assert(av == Seq(100.0 / 3))
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
    // scalar chain respects precedence; comparison drops samples
    val filtered = PromQL.eval(ev,
      """sum by (event_type) (count_over_time({}[2h])) * 10 > 15""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(filtered == Map("click" -> 50.0, "purchase" -> 20.0))
    // global quantile across series (R-7, rounded 6dp)
    val q = PromQL.eval(ev, """quantile(0.5, count_over_time({event_type="click"}[2h]))""", at)
      .select("value").as[Double].collect().head
    assert(q == 2.5) // series counts [2, 3]
  }

  test("without-aggregation, math functions, bool, scalar-left") {
    val at = 2L * hu
    // without(series_id is implicit, user_id) == by(event_type)
    val g = PromQL.eval(ev, """sum without (user_id) (count_over_time({}[2h]))""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(g == Map("click" -> 5.0, "purchase" -> 2.0, "view" -> 1.0))
    // math chain: clamp_max(abs(1 - v), k)
    val m = PromQL.eval(ev,
      """clamp_max(abs(1 - sum by (event_type) (count_over_time({}[2h]))), 3)""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(m == Map("click" -> 3.0, "purchase" -> 1.0, "view" -> 0.0))
    // round half-up to nearest 0.5; sgn; bool comparison
    val r = PromQL.eval(ev, """round(sum by (event_type) (count_over_time({}[2h])) / 2, 0.5)""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(r == Map("click" -> 2.5, "purchase" -> 1.0, "view" -> 0.5))
    val b = PromQL.eval(ev, """sum by (event_type) (count_over_time({}[2h])) >= bool 2""", at)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(b == Map("click" -> 1.0, "purchase" -> 1.0, "view" -> 0.0))
    // absent() on an instant vector
    assert(PromQL.eval(ev, """absent({event_type="nosuch"})""", at)
      .select("value").as[Double].collect().toSeq == Seq(1.0))
    assert(PromQL.eval(ev, """absent({event_type="view"})""", at).count() == 0)
  }

  test("absent synthesizes EQ-matcher labels; computed args stay bare (r12c3)") {
    val at = 2L * hu
    // plain selector: the EQ labels land on the absent row — the
    // alert names WHICH exporter died
    val a = PromQL.eval(ev,
      """absent({event_type="nosuch", user_id="7"})""", at)
    assert(a.columns.contains("event_type") && a.columns.contains("user_id"))
    val row = a.select("event_type", "user_id", "value")
      .as[(String, String, Double)].head()
    assert(row == (("nosuch", "7", 1.0)))
    // regex/NEQ matchers carry no recoverable value — only EQ lands
    val b = PromQL.eval(ev, """absent({event_type=~"nosuch|gone"})""", at)
    assert(!b.columns.contains("event_type") && b.count() == 1)
    // range variant: same synthesis
    val c = PromQL.eval(ev, """absent_over_time({event_type="nosuch"}[2h])""", at)
    assert(c.select("event_type").as[String].head() == "nosuch")
    // `or` congruence without label_replace: the gated shape
    val d = PromQL.eval(ev,
      """absent_over_time({event_type="nosuch"}[2h]) or sum by (event_type) (present_over_time({event_type="view"}[2h]))""",
      at).select("event_type", "value").as[(String, Double)].collect().toMap
    assert(d == Map("nosuch" -> 1.0, "view" -> 1.0))
  }

  test("or unions disjoint label shapes; equal shapes still anti-join (r12c3)") {
    val at = 2L * hu
    // empty left + vector(0): the fallback row renders, labels NULL
    val fb = PromQL.eval(ev,
      """sum by (event_type) (count_over_time({event_type="nosuch"}[2h])) or vector(0)""", at)
      .select("event_type", "value").as[(Option[String], Double)].collect().toSeq
    assert(fb == Seq((None, 0.0)), fb)
    // non-empty left with labels + labelless right: label SETS differ
    // -> no collision, BOTH survive (the faithful Prometheus or)
    val both = PromQL.eval(ev,
      """sum by (event_type) (count_over_time({event_type="view"}[2h])) or vector(7)""", at)
      .select("event_type", "value").as[(Option[String], Double)].collect().toSet
    assert(both == Set((Some("view"), 1.0), (None, 7.0)), both)
    // equal shapes: left wins on collision, right survivor unions in
    val eq = PromQL.eval(ev,
      """sum by (event_type) (count_over_time({event_type="view"}[2h])) or sum by (event_type) (count_over_time({event_type=~"view|click"}[2h]))""",
      at).select("event_type", "value").as[(String, Double)].collect().toMap
    assert(eq == Map("view" -> 1.0, "click" -> 5.0), eq)
  }

  test("set operators: and, unless, or") {
    val at = 2L * hu
    // click-series AND purchase-series matched on user_id → user 1 only,
    // click's values survive
    val a = PromQL.eval(ev,
      """count_over_time(click[2h]) and on (user_id) count_over_time(purchase[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(a == Seq((1L, 3.0)))
    // unless drops the matched entry
    val u = PromQL.eval(ev,
      """count_over_time(click[2h]) unless on (user_id) count_over_time(purchase[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(u == Seq((2L, 2.0)))
    // or unions, left wins on collision (congruent raw vectors)
    val o = PromQL.eval(ev,
      """count_over_time(click[2h]) or count_over_time(view[2h])""", at)
      .select("event_type", "user_id", "value").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(o == Seq(("click", 1L, 3.0), ("click", 2L, 2.0), ("view", 11L, 1.0)))
  }

  test("ignoring(...) and group_left/group_right many-to-one matching") {
    val at = 2L * hu
    // ignoring(event_type) == on(user_id) here: the only other shared
    // label (series_id drops implicitly — it re-tightens what ignoring
    // loosened)
    val viaOn = PromQL.eval(ev,
      """count_over_time(purchase[2h]) / on (user_id) count_over_time(click[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    val viaIgn = PromQL.eval(ev,
      """count_over_time(purchase[2h]) / ignoring (event_type) count_over_time(click[2h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(viaOn == viaIgn && viaOn == Seq((1L, 2.0 / 3)))
    // share-of-total: per-series count / per-type total, the MANY side
    // keeps its full label set
    val share = PromQL.eval(ev,
      """count_over_time({}[2h]) / on (event_type) group_left sum by (event_type) (count_over_time({}[2h]))""",
      at)
      .select("event_type", "user_id", "value").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(share == Seq(("click", 1L, 3.0 / 5), ("click", 2L, 2.0 / 5),
      ("purchase", 1L, 1.0), ("view", 11L, 1.0)))
    // group_right mirrors (one side on the left)
    val shareR = PromQL.eval(ev,
      """sum by (event_type) (count_over_time({}[2h])) / on (event_type) group_right count_over_time({}[2h])""",
      at)
      .select("event_type", "user_id", "value").as[(String, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(shareR == Seq(("click", 1L, 5.0 / 3), ("click", 2L, 2.5),
      ("purchase", 1L, 1.0), ("view", 11L, 1.0)))
    // label-copy lists parse (r9); set ops take no group modifier
    PromQL.parse("""a / on (x) group_left (lbl) b""")
    intercept[IllegalArgumentException](
      PromQL.parse("""a and on (x) group_left b"""))
  }

  test("r9: group_left label copy, vector(), scalar()") {
    val at = 2L * hu
    // info-metric join: the one side synthesizes a `tier` label via
    // label_replace; group_left(tier) copies it onto the many side
    val withTier = PromQL.eval(ev,
      """count_over_time(click[2h]) * on (user_id) group_left(tier) label_replace(count_over_time(click[2h]) * 0 + 1, "tier", "gold", "user_id", "1")""",
      at)
    val rows = withTier.select("user_id", "tier", "value")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    // u1 matched the regex → gold; u2 kept the absent-"" default
    assert(rows == Seq((1L, "gold", 3.0), (2L, "", 2.0)), rows)
    // a copy label missing on the one side refuses with a typed error
    val e = intercept[IllegalArgumentException](PromQL.eval(ev,
      """count_over_time(click[2h]) * on (user_id) group_left(nope) count_over_time(purchase[2h])""",
      at).collect())
    assert(e.getMessage.contains("nope"))
    // vector(0) fallback: a matcher with no series at the instant
    // yields the constant
    val fb = PromQL.eval(ev,
      """sum(count_over_time({event_type="nothere"}[2h])) or vector(0)""", at)
      .select("value").as[Double].collect().toSeq
    assert(fb == Seq(0.0), fb)
    // and when the left side EXISTS, it wins
    val fb2 = PromQL.eval(ev,
      """sum(count_over_time(click[2h])) or vector(0)""", at)
      .select("value").as[Double].collect().toSeq
    assert(fb2 == Seq(5.0), fb2)
    // scalar(): normalize a vector by a 1-element aggregate
    val sc = PromQL.eval(ev,
      """count_over_time(click[2h]) / scalar(sum(count_over_time(click[2h])))""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(sc == Seq((1L, 3.0 / 5), (2L, 2.0 / 5)), sc)
    // a >1-element inner vector makes scalar() NaN — arithmetic
    // propagates it, comparisons drop (IEEE, not Spark NaN ordering)
    val nan = PromQL.eval(ev,
      """count_over_time(click[2h]) * scalar(count_over_time(click[2h]))""", at)
      .select("value").as[Double].collect().toSeq
    assert(nan.length == 2 && nan.forall(_.isNaN), nan)
    assert(PromQL.eval(ev,
      """count_over_time(click[2h]) > scalar(count_over_time(click[2h]))""", at)
      .count() == 0)
    // scalar(constant) folds; scalar-scalar refuses
    assert(PromQL.parse("scalar(3)") == PromQL.ScalarLit(3.0))
    intercept[IllegalArgumentException](
      PromQL.parse("scalar(a) + scalar(b)"))
    // review fixes: vector(scalar(v)) is the LABEL-LESS one-element
    // vector (NaN here: two click series), never the inner vector
    val vs = PromQL.eval(ev, """vector(scalar(click))""", at)
    assert(vs.columns.toSeq == Seq("value"))
    val vsRows = vs.as[Double].collect().toSeq
    assert(vsRows.length == 1 && vsRows.head.isNaN, vsRows)
    // the subquery INNER grid caps at evaluation time on range
    // queries too — the parse-time dur/step check alone cannot see
    // the outer range
    val e2 = intercept[IllegalArgumentException](
      PromQL.evalRange(ev, """max_over_time(rate(click[5m])[10s:1ms])""",
        0L, 2L * hu, hu).collect())
    assert(e2.getMessage.contains("inner grid"), e2.getMessage)
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

  test("ruleGroup: dependent rules read earlier outputs; mixed/unpinned selectors refuse") {
    val dayUs = 86400000000L
    val t0 = 1704067200000000L
    val dir1 = java.nio.file.Files.createTempDirectory("graft_rg_src").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_rg_dst").toString
    val store = new graft.tsdb.ChunkStore(spark, dir1, chunkMs = 86400000L)
    val dest = new graft.tsdb.ChunkStore(spark, dir2, chunkMs = 86400000L)
    val t0n = t0 * 1000L
    val h = 3600000000000L
    store.append(Series.samples(Seq(
      (1L, t0n + 1L * h, 1L, "click", 10.0),
      (2L, t0n + 7L * h, 1L, "click", 20.0),
      (3L, t0n + 13L * h, 1L, "click", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")))
    val served = PromQL.ruleGroup(store, dest, Seq(
      "job:c:sum6h" -> """sum by (event_type) (sum_over_time(click[6h]))""",
      "job:c:max" -> """max_over_time({event_type="job:c:sum6h"}[1d])"""),
      t0 + 21600000000L, t0 + dayUs, 21600000000L)
    assert(served.map(_._1) == Seq("job:c:sum6h", "job:c:max"))
    // A records 10 (6h), 20 (12h), 5 (18h), nothing new at 24h; B's
    // rolling daily max over the recorded tier = 10, 20, 20, 20
    val b = dest.queryAll(
        Seq(graft.tsdb.MatchEq("event_type", "job:c:max")), t0, t0 + dayUs)
      .select("ts_us", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(b == Seq((t0 + 6L * 3600000000L, 10.0), (t0 + 12L * 3600000000L, 20.0),
      (t0 + 18L * 3600000000L, 20.0), (t0 + 24L * 3600000000L, 20.0)), b)
    // a rule mixing recorded and source metrics refuses typed; an
    // unpinned selector routes to the SOURCE (recorded series are
    // read by naming them — the colon convention)
    val mixed = intercept[IllegalArgumentException](PromQL.ruleGroup(store, dest,
      Seq("x" -> """{event_type="job:c:sum6h"} + on(user_id) {user_id="1"}"""),
      t0, t0 + dayUs, 21600000000L))
    assert(mixed.getMessage.contains("mixes"), mixed.getMessage)
    val (_, servedY) = PromQL.ruleGroup(store, dest,
      Seq("job:y:cnt" -> """sum(count_over_time({user_id="1"}[6h]))"""),
      t0 + 21600000000L, t0 + dayUs, 21600000000L).head
    assert(servedY > 0, "unpinned selector must evaluate against the source store")
  }

  test("mad_over_time: per-series median absolute deviation over the window") {
    val at = 2L * hu
    // user 1: values 10,20,40 → med 20, deviations 10,0,20 → MAD 10
    // user 2: values 5,7 → med 6, deviations 1,1 → MAD 1
    val out = PromQL.eval(ev, """mad_over_time({event_type="click"}[3h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 10.0), (2L, 1.0)), out)
  }

  test("limitk / limit_ratio: deterministic pick, grouping, complement contract, parse guards") {
    val at = 2L * hu
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // the deterministic sampling key is the canonical series md5 — the
    // spec computes it independently to predict the pick
    val h1 = md5hex("event_type=click,user_id=1")
    val h2 = md5hex("event_type=click,user_id=2")
    val keepUser = if (h1 < h2) 1L else 2L
    val keptCount = if (keepUser == 1L) 3.0 else 2.0
    val lk = PromQL.eval(ev, """limitk(1, count_over_time({event_type="click"}[3h]))""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSeq
    assert(lk == Seq((keepUser, keptCount)), lk)

    // grouping partitions the limit: one series per event_type
    val lkBy = PromQL.eval(ev, """limitk(1, count_over_time({}[3h])) by (event_type)""", at)
      .select("event_type").as[String].collect().toSeq.sorted
    assert(lkBy == Seq("click", "purchase", "view"), lkBy)

    // the Prometheus partitioning contract: limit_ratio(r) and
    // limit_ratio(r-1) split the vector exactly, no overlap, no loss
    def ratio(r: String) = PromQL.eval(ev,
        s"""limit_ratio($r, count_over_time({event_type="click"}[3h]))""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSet
    val full = PromQL.eval(ev, """count_over_time({event_type="click"}[3h])""", at)
      .select("user_id", "value").as[(Long, Double)].collect().toSet
    val lo = ratio("0.4"); val hi = ratio("-0.6")
    assert((lo ++ hi) == full && (lo & hi).isEmpty, (lo, hi, full))
    assert(ratio("1.0") == full)

    // guards: out-of-range ratio and negative k refuse at parse
    intercept[IllegalArgumentException](PromQL.parse("""limit_ratio(1.5, {a="b"})"""))
    intercept[IllegalArgumentException](PromQL.parse("""limitk(-2, {a="b"})"""))
  }

  test("offset shifts the evaluation window") {
    val at = 2L * hu
    // offset 1h at t=2h == evaluating at t=1h: only samples <= 1h
    val out = PromQL.eval(ev, """max_over_time({event_type="click"}[2h] offset 1h)""", at)
      .select("user_id", "value").as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 20.0), (2L, 5.0)))
  }

  /** The range-grid property: evalRange(start,end,step) must equal
    * the union over grid instants t of eval(..., t) ⊎ {ts_us → t} —
    * the one-plan grid evaluation IS per-instant semantics. */
  private def rangeMatchesInstants(df: DataFrame, q: String,
                                   startUs: Long, endUs: Long, stepUs: Long): Unit = {
    val ranged = PromQL.evalRange(df, q, startUs, endUs, stepUs)
    val cols = ranged.columns.sorted.toSeq
    val got = ranged.select(cols.map(col): _*).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val want = (startUs to endUs by stepUs).flatMap { t =>
      PromQL.eval(df, q, t).withColumn("ts_us", lit(t))
        .select(cols.map(col): _*).collect().map(_.toSeq)
    }.sortBy(_.mkString("|"))
    assert(got == want, s"range grid diverged from instant evals for: $q")
  }

  test("range queries: the one-plan grid equals per-instant evaluation") {
    val qs = Seq(
      """{event_type="click"}""",
      """sum_over_time(click[90m])""",
      """sum_over_time(click[90m] offset 1h)""",
      """rate(click[2h])""",
      """irate(click[2h])""",
      """resets({event_type="click"}[2h])""",
      """deriv(click[2h])""",
      """sum by (event_type) (count_over_time({}[1h]))""",
      """count_over_time(purchase[2h]) / on (user_id) count_over_time(click[2h])""",
      """clamp_max(sum by (event_type) (sum_over_time({}[1h])), 25)""",
      """max_over_time(sum_over_time(click[1h])[2h:1h])""",
      """avg_over_time(rate(click[90m])[2h:30m])""")
    // off-phase grid (start not sample-aligned) catches boundary math
    qs.foreach(q => rangeMatchesInstants(ev, q, 30L * 60000000L, 2L * hu + 30L * 60000000L, hu / 2))
    // absent over a grid: instants before the first view sample
    rangeMatchesInstants(ev, """absent_over_time(view[1h])""", 0L, 2L * hu, hu)
  }

  test("range topk is per grid instant") {
    val out = PromQL.evalRange(ev,
      """topk(1, sum by (event_type) (count_over_time({}[1h])))""",
      hu, 2L * hu, hu)
      .select("ts_us", "event_type", "value").as[(Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    // t=1h: clicks 1 within (0,1h]... counts: window [0,1h] has 2 clicks
    // +1 purchase → click wins; t=2h: window [1h,2h] has 3 clicks → click
    assert(out.map(_._2) == Seq("click", "click"))
    assert(out.map(_._1) == Seq(hu, 2L * hu))
  }

  test("alert rules: FOR semantics over any expression's grid, gaps reset the run") {
    // per-hour click counts: active (>1) at 1h..4h, gap at 5h, active
    // again 6h..7h — FOR 2h ⇒ pending at run starts +1 step, firing
    // from the 3rd consecutive instant; the 6h run never reaches FOR
    val ae = Seq(
      (1L, 1L * h, 1L, "click", 1.0), (2L, 1L * h, 2L, "click", 1.0),
      (3L, 2L * h, 1L, "click", 1.0), (4L, 2L * h, 2L, "click", 1.0),
      (5L, 3L * h, 1L, "click", 1.0), (6L, 3L * h, 2L, "click", 1.0),
      (7L, 4L * h, 1L, "click", 1.0), (8L, 4L * h, 2L, "click", 1.0),
      (9L, 5L * h, 1L, "click", 1.0), // count 1 at 5h → inactive
      (10L, 6L * h, 1L, "click", 1.0), (11L, 6L * h, 2L, "click", 1.0),
      (12L, 7L * h, 1L, "click", 1.0), (13L, 7L * h, 2L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // 30m windows on the hourly grid: each instant sees only its own
    // hour's samples (a 1h inclusive window would bleed the previous
    // hour's and close the gap)
    val out = PromQL.alertRule(ae,
      """sum by (event_type) (count_over_time(click[30m])) > 1""",
      2L * hu, 0L, 7L * hu, hu)
      .select("ts_us", "state", "active_since_us")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L * hu, "pending", 1L * hu), (2L * hu, "pending", 1L * hu),
      (3L * hu, "firing", 1L * hu), (4L * hu, "firing", 1L * hu),
      (6L * hu, "pending", 6L * hu), (7L * hu, "pending", 6L * hu)))
  }

  test("rollup tier: decode-free serving equals the raw tier on aligned windows; per-sample functions refuse") {
    val hm = 300000000000L // 5 min in ns
    // samples strictly INSIDE hourly buckets (h + 5min): on hour-aligned
    // grids the raw inclusive [t−d, t] and the rollup tier's right-open
    // quantized [t−d, t) then hold identical sample sets
    val rv = Seq(
      (1L, 0L * h + hm, 1L, "click", 10.0),
      (2L, 1L * h + hm, 1L, "click", 20.0),
      (3L, 2L * h + hm, 1L, "click", 40.0),
      (4L, 0L * h + hm, 2L, "click", 5.0),
      (5L, 2L * h + hm, 2L, "click", 7.0),
      (6L, 1L * h + hm, 1L, "purchase", 100.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_promql_rollup").toString
    val store = new graft.tsdb.ChunkStore(spark, dir,
      chunkMs = 86400000L, rollupOnClose = true)
    store.append(Series.samples(rv))
    store.closeChunksBelow(10L * 86400000000L)

    def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    }
    // every rollup-servable function + an aggregation on top, on a
    // 2-instant hour-aligned grid — raw == rollup, row for row
    for (q <- Seq(
        """sum by (event_type) (sum_over_time({event_type="click"}[2h]))""",
        """count_over_time(click[2h])""",
        """min_over_time(click[2h])""",
        """max_over_time(click[2h])""",
        """avg_over_time(click[3h])""",
        """present_over_time(purchase[2h])""",
        """max_over_time(sum_over_time(click[1h])[2h:1h])""",
        // counter family (r9): per-bucket first/last points make
        // rate/increase/delta/last_over_time exact on whole-bucket
        // windows — the Thanos-downsampling design
        """rate(click[2h])""",
        """increase(click[2h])""",
        """delta(click[3h])""",
        """last_over_time(click[2h])""",
        """sum by (event_type) (rate(click[2h]))""",
        // r9 function families ride the shared evaluator on BOTH tiers
        """histogram_quantile(0.5, count_values("le", sum_over_time(click[2h])))""",
        """sum_over_time(click[2h]) / scalar(sum(sum_over_time(click[2h])))""",
        """sum(sum_over_time({event_type="nothere"}[2h])) or vector(0)""",
        """day_of_week(vector(time()))""")) {
      val raw = sortedRows(PromQL.evalStoreRange(store, q, 2L * hu, 3L * hu, hu))
      val rolled = sortedRows(PromQL.evalStoreRangeRollup(store, q, 2L * hu, 3L * hu, hu))
      assert(raw == rolled, s"rollup tier diverged from raw for: $q")
      assert(raw.nonEmpty, s"vacuous parity for: $q")
    }
    // instant form works too and drops the grid column
    // quantized window [0, 2h) = buckets 0 and 1: 10+20+5
    val inst = PromQL.evalStoreRollup(store,
      """sum by (event_type) (sum_over_time(click[2h]))""", 2L * hu)
      .select("event_type", "value").as[(String, Double)].collect().toMap
    assert(inst == Map("click" -> 35.0))
    // per-sample semantics refuse with a typed error naming the raw
    // tier (rate moved OFF this list in r9 — it now serves from the
    // per-bucket first/last points; irate/stddev stay genuinely
    // per-sample)
    for (bad <- Seq(
        """irate(click[2h])""",
        """stddev_over_time(click[2h])""",
        """{event_type="click"}""",
        """sum_over_time(click[30m])""",
        """quantile_over_time(0.9, click[2h])""")) {
      val e = intercept[IllegalArgumentException](
        PromQL.evalStoreRollup(store, bad, 3L * hu).collect())
      assert(e.getMessage.contains("raw tier"), s"$bad: ${e.getMessage}")
    }
  }

  test("review fix: rollups without first/last points refuse rate LOUDLY, never a silent 0.0") {
    val rv = Seq(
      (1L, 0L * h + 300000000000L, 1L, "click", 10.0),
      (2L, 1L * h + 300000000000L, 1L, "click", 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val dir = java.nio.file.Files.createTempDirectory("graft_oldgen_rollup").toString
    val store = new graft.tsdb.ChunkStore(spark, dir,
      chunkMs = 86400000L, rollupOnClose = true)
    store.append(Series.samples(rv))
    store.closeChunksBelow(10L * 86400000000L)
    // simulate a PRE-counter-aggregate generation: rewrite the rollup
    // partition without the first/last struct columns
    val rollupPath = s"$dir/rollup"
    val legacy = spark.read.parquet(rollupPath)
      .drop("first_point", "last_point")
    val tmp = java.nio.file.Files.createTempDirectory("graft_oldgen_tmp").toString
    legacy.write.mode("overwrite").parquet(tmp)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(rollupPath), true)
    // keep the chunk partition layout the reader expects
    spark.read.parquet(tmp).write.partitionBy("chunk").parquet(rollupPath)
    val store2 = new graft.tsdb.ChunkStore(spark, dir,
      chunkMs = 86400000L, rollupOnClose = true)
    // frame-level guard: columns absent entirely → typed refusal
    val e = intercept[IllegalArgumentException](
      PromQL.evalStoreRollup(store2, """rate(click[2h])""", 2L * hu).collect())
    assert(e.getMessage.contains("first/last"), e.getMessage)
    // decomposable functions still serve fine from the legacy schema
    assert(PromQL.evalStoreRollup(store2,
      """sum_over_time(click[2h])""", 2L * hu).collect().nonEmpty)
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

  test("a range query is ONE job with bounded fan-out, not a per-step loop") {
    val df = PromQL.evalRange(spark.read.parquet(s"$sfDir/events.parquet"),
      """sum by (event_type) (count_over_time({event_type=~"click|view"}[6h]))""",
      1705276800000000L, 1705363200000000L, 6L * hu)
    // one logical plan evaluates the whole grid — a single explode
    // (the grid emit) and hash aggregations, never N plans
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), "grid emit missing")
    assert(!plan.contains("SortAggregate"), "gridded agg fell out of HashAggregate")
    assert(df.count() > 0)
  }
}
