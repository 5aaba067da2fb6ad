package graft

import graft.promql.PromQL
import org.scalatest.funsuite.AnyFunSuite

/** The /api/v1/format_query printer's contract: for ANY query the
  * parser accepts, parse(format(parse(q))) == parse(q). Checked over
  * a dashboard corpus covering every AST node, then driven through
  * the same fixed-seed mutation engine as PromqlFuzzSpec — every
  * MUTANT that parses must round-trip too, so the printer can never
  * lag the grammar. Pure parser property, no SparkSession. */
class PromqlFormatSpec extends AnyFunSuite {

  private val seeds = Seq(
    """topk(3, sum by (event_type) (sum_over_time({user_id!~"1.*"}[12h])))""",
    """sum by (event_type) (sum_over_time({event_type=~"click|view"}[6h]))""",
    """irate(purchase[1d])""",
    """clamp_max(count_over_time(click[1d]), 2) unless on (user_id) count_over_time(purchase[1d])""",
    """predict_linear({event_type="view"}[2d], 3600)""",
    """max_over_time(sum_over_time(click[6h])[1d:6h])""",
    """{a="b"} / on(user_id) group_left sum by (user_id) ({a="b"})""",
    """{a="b"} * on(instance) group_left(version, os) {c="d"}""",
    """histogram_quantile(0.5, count_values by (event_type) ("le", ceil(sum_over_time({}[1d]) / 10) * 10))""",
    """histogram_quantile_cum(0.9, {le=~".+"})""",
    """label_replace(rate({m="1"}[5m]), "dst", "$1", "user_id", "(.*)")""",
    """label_join({v="1"}, "dst", "-", "a", "b")""",
    """holt_winters({v="1"}[1h], 0.5, 0.25)""",
    """quantile_over_time(0.9, click[2h])""",
    """mad_over_time({event_type="view"}[7d])""",
    """sum_over_time(click[2h] offset 1h @ 3600)""",
    """sum_over_time(click[2h] @ start())""",
    """count_over_time(click[1h] @ end())""",
    """-2^2 + sum(rate({a="b", c!="d"}[5m30s])) % 7""",
    """absent(click) or {x=~"y.*"} and vector(0)""",
    """count_values("n", count_over_time({}[1d]))""",
    """limitk(25, count_over_time({event_type="click"}[7d])) or limit_ratio(0.35, count_over_time({event_type="view"}[7d]))""",
    """limit_ratio(-0.6, {a="b"})""",
    """scalar(sum(click)) * purchase""",
    """time() - timestamp(click)""",
    """hour(vector(time()))""",
    """sum without (user_id) (click)""",
    """stddev by (event_type) (click > bool 3)""",
    """clamp(round({a="b"}, 0.5), 1, 9)""",
    """sort_desc(click offset 90m)""")

  private val alphabet =
    "abcdefghijklmnopqrstuvwxyz0123456789_{}[]()@:,\"'`-+*/%^~!=<>.| smhdw\\"

  private def mutate(rnd: scala.util.Random, s: String): String =
    rnd.nextInt(6) match {
      case 0 if s.nonEmpty =>
        val i = rnd.nextInt(s.length); s.substring(0, i) + s.substring(i + 1)
      case 1 =>
        val i = rnd.nextInt(s.length + 1)
        s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i)
      case 2 if s.nonEmpty =>
        val i = rnd.nextInt(s.length)
        s.substring(0, i) + alphabet(rnd.nextInt(alphabet.length)) + s.substring(i + 1)
      case 3 if s.nonEmpty =>
        s.substring(0, rnd.nextInt(s.length))
      case 4 if s.nonEmpty =>
        val i = rnd.nextInt(s.length)
        val j = i + rnd.nextInt(s.length - i)
        s.substring(0, j) + s.substring(i, j) + s.substring(j)
      case _ =>
        val other = seeds(rnd.nextInt(seeds.length))
        val i = rnd.nextInt(s.length + 1)
        val k = rnd.nextInt(other.length + 1)
        s.substring(0, i) + other.substring(k)
    }

  test("format round-trip on the dashboard corpus — every AST node spelled back losslessly") {
    for (q <- seeds) {
      val ast = PromQL.parse(q)
      val printed = PromQL.format(ast)
      val re = PromQL.parse(printed)
      assert(re == ast, s"\n  q: $q\n  printed: $printed")
      // idempotence: printing is a fixed point after one round
      assert(PromQL.format(re) == printed, s"printer not idempotent for: $q")
    }
  }

  test("format round-trip holds for every PARSABLE mutant (fixed-seed fuzz)") {
    val rnd = new scala.util.Random(20260814L)
    var checked = 0
    for (i <- 1 to 4000) {
      var s = seeds(i % seeds.length)
      for (_ <- 0 to rnd.nextInt(3)) s = mutate(rnd, s)
      val ast =
        try Some(PromQL.parse(s))
        catch { case _: IllegalArgumentException => None }
      ast.foreach { a =>
        val printed = PromQL.format(a)
        val re =
          try PromQL.parse(printed)
          catch {
            case e: IllegalArgumentException =>
              fail(s"printer emitted unparsable text\n  mutant: $s\n  printed: $printed\n  ${e.getMessage}")
          }
        assert(re == a, s"\n  mutant: $s\n  printed: $printed")
        checked += 1
      }
    }
    assert(checked > 300, s"only $checked mutants parsed — mutation corpus degenerated")
  }

  test("folded huge/Inf/NaN scalars print as parseable spellings") {
    // constant folding can build doubles the lexer has no literal for
    // (scientific-notation magnitudes, ±Inf from 1/0) — the printer
    // must emit plain decimals / the division spelling, never
    // Double.toString
    for (q <- Seq(
        """{a="b"} * (1000000 * 1000000 * 1000000)""",
        """{a="b"} * (2 / 3)""",
        """{a="b"} * (1 / 0)""",
        """{a="b"} - (0 - 1) / 0 * ({c="d"})""",
        """{a="b"} + (0 - 0.0000001)""")) {
      val ast = PromQL.parse(q)
      val printed = PromQL.format(ast)
      assert(PromQL.parse(printed) == ast, s"\n  q: $q\n  printed: $printed")
    }
    // NaN: primitive Double equality cannot witness the round trip;
    // the printed form must still parse and be a fixed point
    val nan = PromQL.format(PromQL.parse("""{a="b"} % (0 / 0)"""))
    assert(PromQL.format(PromQL.parse(nan)) == nan, nan)
  }

  test("durations print in the compact descending spelling and round-trip") {
    for (d <- Seq("15s", "1h30m", "500ms", "2w", "1d1h1m1s500ms", "5m30s"))
      assert(PromQL.fmtDur(PromQL.parseDuration(d)) == d)
    assert(PromQL.fmtDur(0L) == "0s")
  }
}
