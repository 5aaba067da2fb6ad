package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.tsdb.{MatchEq, MatchNeq, MatchNre, MatchRe, Matcher, Series}

/** A PromQL front door for the TSDB surface — the query language the
  * reference's USERS actually write (monolith serves Prometheus
  * remote-read, i.e. it receives the selector layer; the function /
  * aggregation layer normally runs in the Prometheus evaluator — this
  * module brings that layer into the engine so a dashboard query runs
  * as ONE distributed plan instead of shipping every matching sample
  * over the wire). Reference: matcher semantics per src/proto
  * LabelMatcher (EQ/NEQ/RE/NRE, proto/types.rs:1198-1211) and
  * label-set series identity (label.rs:118-127).
  *
  * Supported subset (the PromQL core a monitoring dashboard uses):
  *   - instant selectors `{l="v", l2=~"re"}` with 5m lookback, offset
  *   - range functions over `sel[dur]`: rate, increase, last_over_time,
  *     count/sum/avg/min/max/stddev_over_time, quantile_over_time(q,·)
  *   - cross-series aggregation sum/avg/min/max/count with `by (...)`,
  *     topk/bottomk(k,·), quantile(q,·)
  *   - scalar arithmetic (`* / + -` with a number) and comparison
  *     filters (`> < >= <=`, which drop non-matching samples)
  *   - vector-vector arithmetic with `on(...)` matching — the
  *     error-rate / ratio shape (`a / on (user_id) b`); default
  *     matching is the full shared label set
  *
  * Evaluation model: `eval(events, q, atUs)` evaluates the expression
  * AT one instant (range windows are the inclusive [at−d, at], the
  * engine-wide bound convention) and returns an instant vector as a
  * DataFrame — (series_id, event_type, user_id, value) for raw
  * vectors, (by-labels…, value) after aggregation. Every physical
  * shape reuses the plan idioms of the gated operators: matcher
  * pushdown, one-pass struct min/max for first/last, exact-DECIMAL
  * sums, R-7 percentiles rounded 6dp, TakeOrdered top-k — so a parsed
  * query plans identically to its hand-built [[graft.tsdb.TsOps]]
  * composition (spec-pinned in PromqlSpec).
  */
object PromQL {

  // ───────────────────────── AST ─────────────────────────
  sealed trait Expr
  final case class Selector(matchers: Seq[Matcher], offsetUs: Long = 0L) extends Expr
  final case class RangeFn(fn: String, sel: Selector, rangeUs: Long,
                           param: Option[Double] = None) extends Expr
  final case class Agg(op: String, by: Seq[String], arg: Expr,
                       param: Option[Double] = None) extends Expr
  final case class BinScalar(arg: Expr, op: String, k: Double) extends Expr
  /** Vector-vector arithmetic with PromQL `on(...)` matching: the
    * error-rate / ratio shape (`errors / on(user_id) requests`).
    * Empty `on` = full series-identity matching. */
  final case class BinVec(lhs: Expr, op: String, on: Seq[String], rhs: Expr) extends Expr

  private val RangeFns = Set("rate", "increase", "last_over_time",
    "count_over_time", "sum_over_time", "avg_over_time", "min_over_time",
    "max_over_time", "stddev_over_time", "quantile_over_time")
  private val AggOps = Set("sum", "avg", "min", "max", "count",
    "topk", "bottomk", "quantile")

  // ───────────────────────── lexer ─────────────────────────
  private sealed trait Tok
  private case class TIdent(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TNum(v: Double) extends Tok
  private case class TDur(us: Long) extends Tok
  private case class TSym(s: String) extends Tok

  private def lex(q: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def err(m: String) = throw new IllegalArgumentException(s"PromQL lex error at $i: $m")
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = i
        while (i < q.length && (q(i).isLetterOrDigit || q(i) == '_')) i += 1
        out += TIdent(q.substring(j, i))
      } else if (c.isDigit || (c == '.' && i + 1 < q.length && q(i + 1).isDigit)) {
        val j = i
        while (i < q.length && (q(i).isDigit || q(i) == '.')) i += 1
        // a trailing duration unit makes it a duration literal
        if (i < q.length && "smhdw".contains(q(i)) && !q.substring(j, i).contains('.')) {
          val n = q.substring(j, i).toLong
          val unit = q(i) match {
            case 's' => 1000000L
            case 'm' => 60L * 1000000L
            case 'h' => 3600L * 1000000L
            case 'd' => 86400L * 1000000L
            case 'w' => 7L * 86400L * 1000000L
          }
          i += 1
          out += TDur(n * unit)
        } else out += TNum(q.substring(j, i).toDouble)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < q.length && q(i) != quote) {
          if (q(i) == '\\' && i + 1 < q.length) { sb += q(i + 1); i += 2 }
          else { sb += q(i); i += 1 }
        }
        if (i >= q.length) err("unterminated string")
        i += 1
        out += TStr(sb.toString)
      } else {
        val two = if (i + 1 < q.length) q.substring(i, i + 2) else ""
        if (Set("!=", "=~", "!~", ">=", "<=").contains(two)) { out += TSym(two); i += 2 }
        else if ("{}()[],=<>*/+-".contains(c)) { out += TSym(c.toString); i += 1 }
        else err(s"unexpected character '$c'")
      }
    }
    out.result()
  }

  // ───────────────────────── parser ─────────────────────────
  private final class P(toks: Vector[Tok]) {
    private var i = 0
    private def err(m: String) =
      throw new IllegalArgumentException(s"PromQL parse error at token $i: $m")
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    private def next(): Tok = { val t = toks(i); i += 1; t }
    private def expectSym(s: String): Unit = next() match {
      case TSym(`s`) => ()
      case t => err(s"expected '$s', got $t")
    }

    def parse(): Expr = {
      val e = parseExpr()
      if (i != toks.length) err(s"trailing input from token ${toks(i)}")
      e
    }

    private def parseExpr(): Expr = {
      var e = parseUnary()
      // binops, left-associative: scalar RHS → BinScalar (comparisons
      // filter), vector RHS (with optional on(...)) → BinVec
      var done = false
      while (!done) peek match {
        case Some(TSym(op)) if Set("*", "/", "+", "-", ">", "<", ">=", "<=").contains(op) =>
          next()
          peek match {
            case Some(TNum(k)) => next(); e = BinScalar(e, op, k)
            case Some(TIdent("on")) =>
              next(); expectSym("(")
              val oo = Seq.newBuilder[String]
              var more = true
              while (more) next() match {
                case TIdent(l) => oo += l
                  peek match { case Some(TSym(",")) => next() case _ => more = false }
                case t => err(s"label expected in on(...), got $t")
              }
              expectSym(")")
              e = BinVec(e, op, oo.result(), parseUnary())
            case _ => e = BinVec(e, op, Nil, parseUnary())
          }
        case _ => done = true
      }
      e
    }

    private def parseUnary(): Expr = peek match {
      case Some(TSym("(")) => next(); val e = parseExpr(); expectSym(")"); e
      case Some(TSym("{")) => parseSelector()
      case Some(TIdent(name)) if AggOps.contains(name) => parseAgg(name)
      case Some(TIdent(name)) if RangeFns.contains(name) => parseRangeFn(name)
      case Some(t) => err(s"unexpected $t")
      case None => err("empty expression")
    }

    private def parseAgg(op: String): Expr = {
      next() // op
      var by: Seq[String] = Nil
      peek match {
        case Some(TIdent("by")) =>
          next(); expectSym("(")
          val bb = Seq.newBuilder[String]
          var more = true
          while (more) next() match {
            case TIdent(l) => bb += l
              peek match { case Some(TSym(",")) => next() case _ => more = false }
            case t => err(s"label expected in by(...), got $t")
          }
          expectSym(")")
          by = bb.result()
        case _ => ()
      }
      expectSym("(")
      val param: Option[Double] =
        if (op == "topk" || op == "bottomk" || op == "quantile") next() match {
          case TNum(k) => expectSym(","); Some(k)
          case t => err(s"$op needs a leading scalar parameter, got $t")
        } else None
      val arg = parseExpr()
      expectSym(")")
      // trailing `by (...)` form
      peek match {
        case Some(TIdent("by")) if by.isEmpty =>
          next(); expectSym("(")
          val bb = Seq.newBuilder[String]
          var more = true
          while (more) next() match {
            case TIdent(l) => bb += l
              peek match { case Some(TSym(",")) => next() case _ => more = false }
            case t => err(s"label expected in by(...), got $t")
          }
          expectSym(")")
          by = bb.result()
        case _ => ()
      }
      Agg(op, by, arg, param)
    }

    private def parseRangeFn(fn: String): Expr = {
      next() // fn
      expectSym("(")
      val param: Option[Double] =
        if (fn == "quantile_over_time") next() match {
          case TNum(q) => expectSym(","); Some(q)
          case t => err(s"quantile_over_time needs a scalar, got $t")
        } else None
      val sel = parseSelector()
      expectSym("[")
      val dur = next() match {
        case TDur(us) => us
        case t => err(s"duration expected, got $t")
      }
      expectSym("]")
      // `offset` AFTER the range vector also accepted (PromQL places it
      // on the selector; both spellings resolve to the same AST)
      val off = peek match {
        case Some(TIdent("offset")) =>
          next()
          next() match { case TDur(us) => us case t => err(s"duration expected, got $t") }
        case _ => 0L
      }
      expectSym(")")
      RangeFn(fn, sel.copy(offsetUs = sel.offsetUs + off), dur, param)
    }

    private def parseSelector(): Selector = {
      expectSym("{")
      val ms = Seq.newBuilder[Matcher]
      var more = peek match { case Some(TSym("}")) => false case _ => true }
      while (more) {
        val label = next() match {
          case TIdent(l) => l
          case t => err(s"label name expected, got $t")
        }
        val op = next() match {
          case TSym(o) if Set("=", "!=", "=~", "!~").contains(o) => o
          case t => err(s"matcher operator expected, got $t")
        }
        val v = next() match {
          case TStr(s) => s
          case t => err(s"quoted value expected, got $t")
        }
        ms += (op match {
          case "=" => MatchEq(label, v)
          case "!=" => MatchNeq(label, v)
          case "=~" => MatchRe(label, v)
          case "!~" => MatchNre(label, v)
        })
        peek match { case Some(TSym(",")) => next() case _ => more = false }
      }
      expectSym("}")
      val off = peek match {
        case Some(TIdent("offset")) =>
          next()
          next() match {
            case TDur(us) => us
            case t => throw new IllegalArgumentException(s"duration expected after offset, got $t")
          }
        case _ => 0L
      }
      Selector(ms.result(), off)
    }
  }

  def parse(q: String): Expr = new P(lex(q)).parse()

  // ───────────────────────── evaluator ─────────────────────────

  private val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
  private val d6 = org.apache.spark.sql.types.DecimalType(28, 6)
  private val LabelCols = Seq("series_id", "event_type", "user_id")

  /** Evaluate `query` at instant `atUs` over the raw events frame.
    * Raw vectors carry (series_id, event_type, user_id, value);
    * aggregated vectors carry (by-labels…, value). */
  def eval(events: DataFrame, query: String, atUs: Long,
           lookbackUs: Long = 5L * 60L * 1000000L): DataFrame =
    evalExpr(Series.samples(events), parse(query), atUs, lookbackUs)

  /** Widest time window the expression can touch (range/lookback +
    * offset, maxed over every selector) — the store read bound. */
  private[graft] def maxWindowUs(e: Expr, lookbackUs: Long): Long = e match {
    case Selector(_, off) => lookbackUs + off
    case RangeFn(_, Selector(_, off), dur, _) => dur + off
    case Agg(_, _, a, _) => maxWindowUs(a, lookbackUs)
    case BinScalar(a, _, _) => maxWindowUs(a, lookbackUs)
    case BinVec(l, _, _, r) => math.max(maxWindowUs(l, lookbackUs), maxWindowUs(r, lookbackUs))
  }

  /** If the expression reads through exactly ONE selector, its
    * matchers can push into the store scan (chunk partition pruning +
    * label predicate pushdown); multi-selector expressions read
    * unpushed and filter per branch. */
  private[graft] def soleMatchers(e: Expr): Option[Seq[Matcher]] = {
    def sels(x: Expr): Seq[Selector] = x match {
      case s: Selector => Seq(s)
      case RangeFn(_, s, _, _) => Seq(s)
      case Agg(_, _, a, _) => sels(a)
      case BinScalar(a, _, _) => sels(a)
      case BinVec(l, _, _, r) => sels(l) ++ sels(r)
    }
    sels(e) match { case Seq(one) => Some(one.matchers) case _ => None }
  }

  /** Evaluate against a [[graft.tsdb.ChunkStore]] — the serving path
    * behind the HTTP /api/v1/query endpoint. The store read is
    * bounded to the expression's widest window, single-selector
    * matchers push into the federated chunk query (partition pruning
    * does the reference's chunk-overlap check), and labels re-attach
    * from the store catalog exactly as the remote-read path does.
    * Store samples carry no event_id (the wire drops it); a constant
    * surrogate keeps the evaluator's total orders — duplicate
    * (series, ts) points are already merged by ingest. */
  def evalStore(store: graft.tsdb.ChunkStore, query: String, atUs: Long,
                lookbackUs: Long = 5L * 60L * 1000000L): DataFrame = {
    val ast = parse(query)
    val horizon = maxWindowUs(ast, lookbackUs)
    val ms = soleMatchers(ast).getOrElse(Nil)
    val samples = store.queryAll(ms, atUs - horizon, atUs)
      .join(store.catalog(), "series_id")
      .withColumn("event_id", lit(0L))
    evalExpr(samples, ast, atUs, lookbackUs)
  }

  private def evalExpr(samples: DataFrame, e: Expr, atUs: Long,
                       lookbackUs: Long): DataFrame = e match {
    case Selector(ms, off) =>
      // instant selector: latest sample within the lookback window,
      // per series — the one-pass struct-max idiom (ts_last_over_time)
      val at = atUs - off
      samples
        .filter(Matcher.all(ms))
        .filter(col("ts_us") >= at - lookbackUs && col("ts_us") <= at)
        // labels are functions of series_id — grouping by all three
        // keeps them WITHOUT first(string) agg buffers, which silently
        // demote the whole aggregation to SortAggregate (the struct-max
        // lesson, SURVEY §5)
        .groupBy(col("series_id"), col("event_type"), col("user_id"))
        .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("l"))
        .select(col("series_id"), col("event_type"), col("user_id"),
          col("l.value").as("value"))

    case RangeFn(fn, Selector(ms, off), dur, param) =>
      val at = atUs - off
      val in = samples
        .filter(Matcher.all(ms))
        .filter(col("ts_us") >= at - dur && col("ts_us") <= at)
      // labels ride as group keys, not first() buffers (see Selector)
      val g = in.groupBy(col("series_id"), col("event_type"), col("user_id"))
      def keyed(valueCol: Column, aggs: (String, Column)*): DataFrame =
        g.agg(aggs.head._2.as(aggs.head._1),
            aggs.tail.map { case (n, c) => c.as(n) }: _*)
          .select((LabelCols.map(col) :+ valueCol.as("value")): _*)
      fn match {
        case "count_over_time" => keyed(col("n").cast("double"), "n" -> count(lit(1)))
        case "sum_over_time" =>
          keyed(col("s").cast("double"), "s" -> sum(col("value").cast(d2)).cast(d2))
        case "avg_over_time" =>
          keyed(col("s").cast("double") / col("n"),
            "s" -> sum(col("value").cast(d2)).cast(d2), "n" -> count(lit(1)))
        case "min_over_time" => keyed(col("m"), "m" -> min(col("value")))
        case "max_over_time" => keyed(col("m"), "m" -> max(col("value")))
        case "last_over_time" =>
          keyed(col("l.value"),
            "l" -> max(struct(col("ts_us"), col("event_id"), col("value"))))
        case "stddev_over_time" =>
          // exact decimal moments, double math once (ts_stddev shape)
          keyed(sqrt(col("s2").cast("double") / col("n") -
              (col("s1").cast("double") / col("n")) * (col("s1").cast("double") / col("n"))),
            "s1" -> sum(col("value").cast(d6)).cast("decimal(38,6)"),
            "s2" -> sum((col("value") * col("value")).cast(d6)).cast("decimal(38,6)"),
            "n" -> count(lit(1)))
        case "quantile_over_time" =>
          keyed(col("q"),
            "q" -> round(expr(s"percentile(value, ${param.get})"), 6))
        case "rate" | "increase" =>
          val diff = col("l.value") - col("f.value")
          val v =
            if (fn == "increase") diff
            else when(col("l.ts_us") > col("f.ts_us"),
              diff / ((col("l.ts_us") - col("f.ts_us")) / lit(1000000.0)))
              .otherwise(lit(0.0))
          keyed(v,
            "f" -> min(struct(col("ts_us"), col("event_id"), col("value"))),
            "l" -> max(struct(col("ts_us"), col("event_id"), col("value"))))
      }

    case Agg(op, by, arg, param) =>
      val in = evalExpr(samples, arg, atUs, lookbackUs)
      val keys = by.map(col)
      op match {
        case "topk" | "bottomk" =>
          // global top-k of an instant vector: TakeOrderedAndProject
          // (bounded per-partition heaps). The tiebreak is the frame's
          // full label set — raw vectors break on series_id, aggregated
          // vectors on their by-labels — so the k-th boundary is total-
          // ordered either way
          val k = param.get.toInt
          val ties = in.columns.filterNot(_ == "value").sorted.map(c => col(c).asc)
          val sorted =
            if (op == "topk") in.orderBy((col("value").desc +: ties): _*)
            else in.orderBy((col("value").asc +: ties): _*)
          sorted.limit(k)
        case "quantile" =>
          val q = param.get
          if (by.isEmpty)
            in.agg(round(expr(s"percentile(value, $q)"), 6).as("value"))
          else in.groupBy(keys: _*)
            .agg(round(expr(s"percentile(value, $q)"), 6).as("value"))
        case _ =>
          val a = op match {
            case "sum" => sum(col("value").cast(d6)).cast("double")
            case "avg" => (sum(col("value").cast(d6)).cast("double") / count(lit(1)))
            case "min" => min(col("value"))
            case "max" => max(col("value"))
            case "count" => count(lit(1)).cast("double")
          }
          if (by.isEmpty) in.agg(a.as("value"))
          else in.groupBy(keys: _*).agg(a.as("value"))
      }

    case BinScalar(arg, op, k) =>
      val in = evalExpr(samples, arg, atUs, lookbackUs)
      op match {
        case "*" => in.withColumn("value", col("value") * k)
        case "/" => in.withColumn("value", col("value") / k)
        case "+" => in.withColumn("value", col("value") + k)
        case "-" => in.withColumn("value", col("value") - k)
        case ">" => in.filter(col("value") > k)
        case "<" => in.filter(col("value") < k)
        case ">=" => in.filter(col("value") >= k)
        case "<=" => in.filter(col("value") <= k)
      }

    case BinVec(l, op, on, r) =>
      // both sides are instant vectors; match on `on(...)` labels, or
      // on every shared label column (series identity for raw
      // vectors). Inner match: unpaired entries drop, as in PromQL.
      // (PromQL's 1:1 cardinality check is the caller's contract —
      // a many-to-many on() match fans out like the join it is.)
      val lf = evalExpr(samples, l, atUs, lookbackUs)
      val rf = evalExpr(samples, r, atUs, lookbackUs)
      val keys =
        if (on.nonEmpty) on
        else (lf.columns.toSet intersect rf.columns.toSet - "value").toSeq.sorted
      require(keys.nonEmpty, "no shared labels to match on — use on(...)")
      val lv = lf.select(keys.map(col) :+ col("value").as("lv"): _*)
      val rv = rf.select(keys.map(col) :+ col("value").as("rv"): _*)
      val j = lv.join(rv, keys)
      val out = op match {
        case "*" => j.withColumn("value", col("lv") * col("rv"))
        case "/" => j.withColumn("value", col("lv") / col("rv"))
        case "+" => j.withColumn("value", col("lv") + col("rv"))
        case "-" => j.withColumn("value", col("lv") - col("rv"))
        case ">" => j.filter(col("lv") > col("rv")).withColumn("value", col("lv"))
        case "<" => j.filter(col("lv") < col("rv")).withColumn("value", col("lv"))
        case ">=" => j.filter(col("lv") >= col("rv")).withColumn("value", col("lv"))
        case "<=" => j.filter(col("lv") <= col("rv")).withColumn("value", col("lv"))
      }
      out.select(keys.map(col) :+ col("value"): _*)
  }
}
