package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-side TSDB operators over the sample frame produced by
  * [[Series.samples]]. All are pure DataFrame compositions: Catalyst
  * prunes columns, pushes the range predicates into the scan, and the
  * per-series operators shuffle once on `series_id` (md5 — uniform, no
  * skew at 100 TB).
  *
  * Determinism discipline (oracle hash-match): exact sums go through
  * DECIMAL (order-independent) and are cast to double once; every
  * first/last pick is totally ordered by (ts_us, event_id).
  */
object TsOps {

  private val UsPerHour = 3600L * 1000 * 1000

  /** SUM that is independent of partitioning/summation order: cast to
    * decimal (exact, associative), sum, one cast back to double. */
  def exactSum(c: Column, scale: Int = 6): Column =
    sum(c.cast(org.apache.spark.sql.types.DecimalType(28, scale))).cast("double")

  /** Range query with label matchers — the reference's read path
    * (src/db.rs:205-263 `MonolithDb::query` +
    * src/storage/common.rs:32-48 `trim_time_series`, inclusive bounds).
    */
  /** Inclusive [startUs, endUs] bound on a sample frame. When the
    * frame carries the RAW time column (Series.samplesWithRaw), the
    * EQUIVALENT predicate is added on it: the derived-ts_us filter
    * stops at the scan's DataFilters, the raw one reaches parquet
    * row-group statistics and skips whole row groups of a time-sorted
    * corpus. Equivalence:
    *  - ns LONG: ts_us = ts div 1000 (truncating); for startUs > 0,
    *    ts_us >= startUs ⟺ ts >= startUs·1000 (negatives fail both),
    *    and ts_us <= endUs ⟺ ts <= endUs·1000 + 999; overflow-guarded
    *  - TIMESTAMP: ts_us = unix_micros(ts), both grains are micros ⇒
    *    timestamp_micros bounds are exact */
  def rangeBound(samples: DataFrame, startUs: Long, endUs: Long): DataFrame = {
    val base = samples.filter(col("ts_us") >= startUs && col("ts_us") <= endUs)
    if (!samples.columns.contains("ts_raw")) base
    else samples.schema("ts_raw").dataType match {
      case org.apache.spark.sql.types.LongType
        if startUs > 0 && endUs < (Long.MaxValue - 999) / 1000 =>
        base.filter(col("ts_raw") >= startUs * 1000 &&
          col("ts_raw") <= endUs * 1000 + 999)
      case org.apache.spark.sql.types.TimestampType =>
        base.filter(col("ts_raw") >= timestamp_micros(lit(startUs)) &&
          col("ts_raw") <= timestamp_micros(lit(endUs)))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ ordering IS wall-clock ordering and ts_us is the UTC
        // epoch of that wall clock (Series.tsUs), so LocalDateTime
        // literals at the exact micros bounds are an equivalent
        // predicate — and a foldable NTZ literal reaches parquet
        // row-group statistics just like the TZ case above.
        def ntz(us: Long) = lit(java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          (Math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
        base.filter(col("ts_raw") >= ntz(startUs) && col("ts_raw") <= ntz(endUs))
      case _ => base
    }
  }

  def rangeQuery(samples: DataFrame, ms: Seq[Matcher], startUs: Long, endUs: Long): DataFrame =
    rangeBound(samples.filter(Matcher.all(ms)), startUs, endUs)
      .select("series_id", "ts_us", "value")

  /** Per-series fixed-window downsample (bucket start in epoch-ms).
    * Partial aggregation (map-side combine) keeps the shuffle small. */
  def downsample(samples: DataFrame, bucketMs: Long = 3600000L): DataFrame = {
    val bucketUs = bucketMs * 1000
    samples
      .groupBy(
        col("series_id"),
        (expr(s"ts_us div $bucketUs") * bucketMs).as("bucket_ms"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        exactSum(col("value"), 2).as("sum_value"))
      .withColumn("avg_value", col("sum_value") / col("n_points"))
  }

  /** Counter-rate per series over its full extent: (last−first) value
    * over (last−first) seconds. First/last are the min/max of the
    * struct (ts_us, event_id, value) — one aggregation pass, totally
    * ordered, no window shuffle. */
  def rate(samples: DataFrame): DataFrame =
    samples
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(struct(col("ts_us"), col("event_id"), col("value"))).as("f"),
        max(struct(col("ts_us"), col("event_id"), col("value"))).as("l"))
      .select(
        col("series_id"),
        col("n_points"),
        col("f.ts_us").as("first_ts_us"),
        col("l.ts_us").as("last_ts_us"),
        col("f.value").as("first_value"),
        col("l.value").as("last_value"),
        when(col("l.ts_us") > col("f.ts_us"),
          (col("l.value") - col("f.value")) /
            ((col("l.ts_us") - col("f.ts_us")) / lit(1000000.0)))
          .otherwise(lit(0.0)).as("rate_per_sec"))

  /** Per-series per-bucket increase (PromQL `increase`-style on raw
    * samples): last − first value inside each fixed window, first/last
    * totally ordered by (ts, event_id). One aggregation pass. */
  def increase(samples: DataFrame, bucketMs: Long = 3600000L): DataFrame = {
    val bucketUs = bucketMs * 1000
    samples
      .groupBy(
        col("series_id"),
        (expr(s"ts_us div $bucketUs") * bucketMs).as("bucket_ms"))
      .agg(
        count(lit(1)).as("n_points"),
        min(struct(col("ts_us"), col("event_id"), col("value"))).as("f"),
        max(struct(col("ts_us"), col("event_id"), col("value"))).as("l"))
      .select(
        col("series_id"), col("bucket_ms"), col("n_points"),
        (col("l.value") - col("f.value")).as("increase"))
  }

  /** Latest sample per series at or before `atUs` (PromQL instant
    * lookup). max-of-struct picks the row in one aggregation. */
  def lastOverTime(samples: DataFrame, atUs: Long): DataFrame =
    samples
      .filter(col("ts_us") <= atUs)
      .groupBy(col("series_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("l"))
      .select(col("series_id"), col("l.ts_us").as("ts_us"), col("l.value").as("value"))

  /** Sliding-window moving aggregate per series (PromQL
    * `avg_over_time(m[1h])` at every sample point): a RANGE window
    * over the trailing `windowUs`, so rows with equal timestamps are
    * frame peers in every engine. The rolling sum runs in DECIMAL
    * (exact, associative) and casts to double once — the moving avg
    * is then bit-identical regardless of partitioning or the window
    * implementation's summation order. One shuffle by series_id; the
    * per-series sort is bounded by series cardinality × retention. */
  def movingAvg(samples: DataFrame, windowUs: Long = UsPerHour): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"))
      .rangeBetween(-windowUs, 0)
    samples
      .select(col("series_id"), col("ts_us"), col("value"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("sum_win",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))
          .over(w).cast("double"))
      .withColumn("avg_win", col("sum_win") / col("n_win"))
  }

  /** Rolling-band anomalies (the Bollinger-band monitoring rule, the
    * trailing-window sibling of the global [[zscoreOutliers]]): flag
    * samples outside mean ± z·σ of their series' trailing `windowUs`
    * window. Determinism discipline of [[movingAvg]] extended to the
    * second moment: rolling Σv and Σv² run in DECIMAL (exact,
    * associative — value is 2dp, so v² is exactly 4dp), cast to
    * double once; mean/σ/band are then identical IEEE arithmetic in
    * any engine, and sqrt is correctly rounded by spec, so the
    * strictly-greater breach test never straddles engines. Windows
    * thinner than `minPoints` don't alarm (a 2-point σ is noise).
    * One shuffle by series, one bounded per-series sort. */
  def bandOutliers(samples: DataFrame, windowUs: Long = UsPerHour,
                   z: Double = 2.0, minPoints: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"))
      .rangeBetween(-windowUs, 0)
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val v2 = col("value").cast(d2)
    samples
      .select(col("series_id"), col("ts_us"), col("value"))
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("s1", sum(col("value").cast(d2)).over(w).cast("double"))
      .withColumn("s2", sum(v2 * v2).over(w).cast("double"))
      .filter(col("n_win") >= minPoints)
      .withColumn("mean_win", col("s1") / col("n_win"))
      .withColumn("band", lit(z) * sqrt(greatest(
        (col("s2") - col("s1") * col("s1") / col("n_win")) / col("n_win"), lit(0.0))))
      .filter(abs(col("value") - col("mean_win")) > col("band"))
      .select(col("series_id"), col("ts_us"), col("value"),
        col("n_win"), col("mean_win"), col("band"))
  }

  /** First-order event-type transition matrix — the Markov-chain view
    * of user behavior (which event follows which, with MLE
    * probabilities): consecutive pairs per user under the engine-wide
    * (ts_us, event_id) total order, counted globally, normalized by
    * the from-state's outgoing total. Plan: one shuffle by user + a
    * bounded per-user sort for the lead, ONE pair aggregation, and
    * the outgoing total as a sum window over the aggregated
    * |event_type|² frame — a groupBy+join-back would recompute the
    * whole lead pipeline on the build side (the bigramLogprob
    * recompute-per-consumer lesson, caught here by PlanSpec). */
  def transitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Series.samples(events)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("ts_us"), col("event_id"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("out_n", sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("prob", col("n").cast("double") / col("out_n"))
  }

  /** STATIONARY DISTRIBUTION of the user-journey Markov chain — the
    * long-run read of [[transitions]]: where journeys concentrate if
    * users keep following the observed transition probabilities (the
    * "which surface owns attention" number a per-step transition
    * table can't give directly). Damped power iteration (0.85, the
    * PageRank teleport) so reducible/periodic chains still converge;
    * mass leaving an absorbing state decays into the teleport floor —
    * the PageRank sink convention.
    *
    * Determinism: the graph_pagerank discipline — π in integer
    * NANO-UNITS with floor division (contribution = (π·n) div out_n,
    * damping = (85·Σ) div 100), bit-exact under any partitioning and
    * restatable engine-for-engine; fixed `iters` sweeps; states with
    * no inbound mass re-attach each sweep at the teleport floor.
    * Scale: the corpus cost is the ONE transitions pass; every sweep
    * is arithmetic on the (event types)² edge frame
    * (localCheckpointed — the iterative-loop lineage lesson). */
  def markovStationary(events: DataFrame, iters: Int = 8,
                       driverMaxStates: Int = 1024): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters in [1, 50]")
    // EXECUTION SPLIT (the pcaComponentsDriver precedent): the edge
    // frame is (event types)² — a state-space property, not a data
    // size — so below the cap the sweeps run on the DRIVER over the
    // collected matrix in plain Long arithmetic (floor division and
    // integer sums are order-free, so the replica is bit-for-bit the
    // distributed result; r12 optimization — 8 sweeps were ~24 tiny
    // Spark jobs of pure scheduling overhead on a 49-row frame).
    // Above the cap the distributed loop below still runs.
    val eDf = transitions(events)
      .select(col("from_type"), col("to_type"), col("n"), col("out_n"))
    val spark = events.sparkSession
    // Collect cap: 65536 edges (≈256 fully-connected states, a few MB)
    // rather than driverMaxStates² (~1M rows) — far above any realistic
    // event-type vocabulary while bounding the thrown-away allocation
    // when the gate falls back to the distributed loop (ADVICE r12).
    // The collected set then checks STATES against driverMaxStates, so
    // the parameter bounds what its name says; both paths are
    // bit-identical, so the regime split can move freely.
    val edgeCap = math.min(driverMaxStates.toLong * driverMaxStates, 65536L).toInt
    val edgeRows = eDf.limit(edgeCap + 1).collect()
    lazy val stsAll = (edgeRows.map(_.getString(0)) ++ edgeRows.map(_.getString(1)))
      .distinct
    if (edgeRows.length <= edgeCap && stsAll.length <= driverMaxStates) {
      import spark.implicits._
      val sts = stsAll.sorted
      require(sts.nonEmpty, "no transitions — need at least two events for one user")
      val nSt = sts.length.toLong
      val baseL = 150000000L / nSt
      val initL = 1000000000L / nSt
      var pi = sts.map(_ -> initL).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map.empty[String, Long]
        edgeRows.foreach { r =>
          val c = pi(r.getString(0)) * r.getLong(2) / r.getLong(3)
          contrib.updateWith(r.getString(1)) {
            case Some(s) => Some(s + c); case None => Some(c) }
        }
        pi = sts.map(s => s -> contrib.get(s)
          .map(sc => baseL + 85L * sc / 100L).getOrElse(baseL)).toMap
      }
      return sts.map(s => (s, pi(s), pi(s) / 1e9))
        .toSeq.toDF("event_type", "pi_nano", "pi")
    }
    val e = eDf
      .localCheckpoint() // types²-sized; read every sweep
    val states = e.select(col("from_type").as("state"))
      .unionByName(e.select(col("to_type").as("state"))).distinct()
      .localCheckpoint()
    val nStates = states.count()
    require(nStates > 0, "no transitions — need at least two events for one user")
    val base = 150000000L / nStates // (1−d)/N in nano-units, floored
    val init = 1000000000L / nStates
    var pi = states.select(col("state"), lit(init).as("r")).localCheckpoint()
    for (_ <- 1 to iters) {
      val inbound = e.join(pi, e("from_type") === pi("state"))
        .select(col("to_type").as("state"), expr("(r * n) div out_n").as("c"))
        .groupBy(col("state"))
        .agg((lit(base) + expr("(85 * sum(c)) div 100")).as("ri"))
      pi = states.join(inbound, Seq("state"), "left")
        .select(col("state"), coalesce(col("ri"), lit(base)).as("r"))
        .localCheckpoint()
    }
    pi.select(col("state").as("event_type"), col("r").as("pi_nano"),
      (col("r") / lit(1000000000.0)).as("pi"))
  }

  /** Top-k event-type paths (consecutive trigrams per user under the
    * (ts_us, event_id) total order) — the funnel-discovery query that
    * tells an analyst which 3-step journeys dominate, before any
    * hand-built funnel exists. orderBy+limit plans as
    * TakeOrderedAndProject (per-partition bounded top-k, O(k) driver
    * merge); the (count desc, path asc) order is total, so the k-th
    * boundary never depends on partitioning. */
  def topPaths(events: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Series.samples(events)
      .select(col("user_id"), col("event_type"), col("ts_us"), col("event_id"))
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(concat_ws(" > ", col("event_type"), col("t1"), col("t2")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** Prometheus alerting-rule FOR semantics: a threshold alert is
    * PENDING while its condition holds and FIRING once it has held
    * continuously for ≥ `forUs` (discrete reading: since the start of
    * the current unbroken run of condition-true samples — one false
    * sample resets the clock, exactly the rule evaluator's state
    * machine). Gaps-and-islands in ONE window pass: lag marks run
    * starts, an ignore-nulls running last carries the active-since
    * timestamp — both windows share the (series, (ts,event_id)) sort,
    * so the operator is one shuffle + one bounded per-series sort.
    * Output: every active sample with its run start and state. */
  def alertFiring(samples: DataFrame, threshold: Double,
                  forUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"), col("event_id"))
    samples
      .select(col("series_id"), col("ts_us"), col("event_id"), col("value"))
      .withColumn("cond", col("value") > lit(threshold))
      .withColumn("prev_cond", lag(col("cond"), 1, false).over(w))
      .withColumn("run_start",
        when(col("cond") && !col("prev_cond"), col("ts_us")))
      .withColumn("active_since_us",
        last(col("run_start"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cond"))
      .withColumn("state",
        when(col("ts_us") - col("active_since_us") >= forUs, "firing")
          .otherwise("pending"))
      .select(col("series_id"), col("ts_us"), col("value"),
        col("active_since_us"), col("state"))
  }

  /** Batch last-touch attribution — the revenue question behind the
    * streaming [[graft.streaming.StreamIngest.attributionJoin]]: each
    * purchase is attributed to the SAME user's most recent click if it
    * happened within `windowUs` before, and revenue rolls up per day
    * into attributed vs organic. The last-click lookup rides
    * [[AsOf.joinAsOf]] (one shuffle + sort of clicks ∪ purchases by
    * user — never the quadratic per-key theta-join), the window bound
    * is a post-join comparison, and the rollup is one tiny day-grain
    * aggregation with exact DECIMAL revenue sums. */
  def attribution(events: DataFrame, windowUs: Long = 3600000000L): DataFrame = {
    val sm = Series.samples(events)
    val purchases = sm.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("value"))
    val clicks = sm.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us")).distinct()
      .withColumn("click_ts", col("ts_us"))
    val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
    AsOf.joinAsOf(purchases, clicks, Seq("user_id"), "ts_us", "click_ts", "last_click_ts")
      .withColumn("attributed",
        col("last_click_ts").isNotNull &&
          col("ts_us") - col("last_click_ts") <= windowUs)
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
        sum(when(col("attributed"), col("value")).otherwise(0.0).cast(d2))
          .cast("double").as("attributed_value"),
        sum(when(!col("attributed"), col("value")).otherwise(0.0).cast(d2))
          .cast("double").as("organic_value"))
  }

  /** DAU / WAU / stickiness — the standard engagement rollup. A
    * 7-day DISTINCT-over-window has no scale-clean window form
    * (count-distinct frames aren't supported, and buffering users per
    * frame would be O(WAU) state per day); instead each distinct
    * (user, day) fans out map-side to the 7 window-days it supports
    * (bounded ×7 explode), and one distinct + one count per day does
    * the rest — every step partial-aggregates before its exchange.
    * Output days are those with any activity (inner join with DAU);
    * stickiness = DAU/WAU ∈ [1/7, 1]. */
  def dauWau(events: DataFrame): DataFrame = {
    val ud = Series.samples(events)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness", col("dau").cast("double") / col("wau"))
  }

  /** Gap-filled per-series hourly series (Prometheus staleness
    * semantics, bounded-lookback carry-forward): every bucket from a
    * series' first to last hour appears, each carrying the last value
    * at or before it (total order (ts, event_id)); `filled` marks
    * carried rows.
    *
    * Plan shape: each PRESENT bucket looks ahead to the series' next
    * present bucket (`lead`) and EMITS its own gap — explode of
    * sequence(bucket, next−1) — with its value riding along. The
    * series' first/last buckets are present by construction (they
    * hold the min/max sample), so every spine bucket is covered.
    * This does the whole operator in one groupBy + one window over
    * present buckets ONLY (typically a small fraction of the filled
    * spine — 50× at the bench scale), where the naive spine shape
    * pays a spine join plus a carry-forward window sort over the FULL
    * output. The explode is map-side fan-out, never shuffled. */
  /** Grid resampling with linear interpolation — the TSDB resample
    * every downsampling/alignment pipeline needs (gapFill carries the
    * LAST value forward, Prometheus staleness-style; this estimates
    * the value AT each grid instant between its neighbors).
    *
    * Plan shape (the gapFill lesson applied): each ADJACENT SAMPLE
    * PAIR owns the grid instants in its half-open span (pt, nt] and
    * EMITS them (map-side explode), so the one window pass (lead)
    * runs over the samples only — never over the grid, which at
    * hourly grain over sparse series outnumbers samples ~50:1 (the
    * union-then-window draft cost 5.2s at sf0.1; this shape ~1s).
    * Interpolation only — grid before the first sample is unowned and
    * never emitted. Determinism: pair order has a total-order
    * tiebreak (ts, event_id), ownership is exact integer arithmetic,
    * and the interpolation is one fixed IEEE expression. */
  def interpolate(samples: DataFrame, gridMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gridUs = gridMs * 1000
    val w = Window.partitionBy(col("series_id")).orderBy(col("pt"), col("event_id"))
    samples
      .select(col("series_id"), col("ts_us").as("pt"), col("value").as("pv"),
        col("event_id"))
      .withColumn("nt", lead(col("pt"), 1).over(w))
      .withColumn("nv", lead(col("pv"), 1).over(w))
      // guard g0 <= g1 BEFORE explode: Spark's sequence(a, b) REVERSES
      // when a > b (a gap-free pair would fabricate grid points)
      .filter(col("nt").isNotNull &&
        expr(s"pt div $gridUs + 1") <= expr(s"nt div $gridUs"))
      .select(col("series_id"), col("pt"), col("pv"), col("nt"), col("nv"),
        explode(sequence(expr(s"pt div $gridUs + 1"), expr(s"nt div $gridUs"))).as("g"))
      .select(col("series_id"), expr(s"g * $gridMs").as("grid_ms"),
        (col("pv") + (col("nv") - col("pv")) *
          ((col("g") * gridUs - col("pt")).cast("double") /
            (col("nt") - col("pt")).cast("double"))).as("value_interp"))
  }

  def gapFill(samples: DataFrame, bucketMs: Long = 3600000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketUs = bucketMs * 1000
    val perBucket = samples
      .groupBy(col("series_id"), expr(s"ts_us div $bucketUs").as("bucket"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("l"))
      .select(col("series_id"), col("bucket"), col("l.value").as("v"))
    val w = Window.partitionBy(col("series_id")).orderBy(col("bucket"))
    perBucket
      .withColumn("next_b", lead(col("bucket"), 1).over(w))
      .select(col("series_id"), col("v"), col("bucket").as("data_bucket"),
        explode(sequence(col("bucket"),
          coalesce(col("next_b") - 1, col("bucket")))).as("bucket"))
      .select(col("series_id"), (col("bucket") * bucketMs).as("bucket_ms"),
        col("v").as("value"), (col("bucket") =!= col("data_bucket")).as("filled"))
  }

  /** Per-chunk occupancy stats — the reference's chunk bookkeeping
    * (src/db.rs:265-303 swap, src/chunk/chunk.rs). Chunk id is the
    * 1-hour bucket ordinal (integer division — exact). */
  def chunkStats(samples: DataFrame, chunkMs: Long = 3600000L): DataFrame = {
    val chunkUs = chunkMs * 1000
    samples
      .groupBy(expr(s"ts_us div $chunkUs").as("chunk"))
      .agg(
        count(lit(1)).as("n_points"),
        countDistinct(col("series_id")).as("n_series"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"))
  }

  /** SERIES CHURN — the Prometheus head-churn diagnostic (the
    * `prometheus_tsdb_head_series_created_total` story as a query):
    * per day, how many series APPEARED (first sample), DISAPPEARED
    * (last sample) and were ACTIVE (lifespan covers the day). High
    * created+ended with flat active = label churn — the cardinality
    * failure mode that kills real TSDBs, and the report an operator
    * reads before hunting the offending label.
    *
    * Scale shape: the ONLY corpus-scale work is one groupBy(series)
    * min/max (map-side partial); every later frame is series-grain,
    * and the active-day explode is bounded by lifespan days — i.e.
    * retention, never sample count. */
  def seriesChurn(samples: DataFrame): DataFrame = {
    val dayUs = 86400000000L
    val life = samples.groupBy(col("series_id"))
      .agg(min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
      .select(col("series_id"),
        expr(s"first_us div $dayUs").as("first_day"),
        expr(s"last_us div $dayUs").as("last_day"))
      // THREE consumers (active/created/ended) each embedded this
      // corpus-scale lifetime aggregation — persist so it runs once
      // (r13; §5 — unpaired persist, series-sized, family-cleared)
      .persist()
    val active = life
      .select(explode(sequence(col("first_day"), col("last_day"))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("active"))
    val created = life.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("created"))
    val ended = life.groupBy(col("last_day").as("day"))
      .agg(count(lit(1)).as("ended"))
    active.join(created, Seq("day"), "left").join(ended, Seq("day"), "left")
      .select((col("day") * dayUs).as("day_us"), col("active"),
        coalesce(col("created"), lit(0L)).as("created"),
        coalesce(col("ended"), lit(0L)).as("ended"))
  }

  /** PromQL `resets()`: number of strictly-decreasing adjacent sample
    * pairs per series (counter resets), adjacency totally ordered by
    * (ts_us, event_id). One window pass + one aggregation, both on the
    * series_id shuffle. */
  def resets(samples: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"), col("event_id"))
    samples
      .withColumn("prev_v", lag(col("value"), 1).over(w))
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("value") < col("prev_v"), 1L).otherwise(0L)).as("n_resets"))
  }

  /** Counter-reset REPAIR — the monotone cumulative counter Prometheus
    * reconstructs under the hood for rate/increase, materialized as a
    * series (the export a downstream system without reset logic
    * needs): adjusted_i = Σ_{j≤i} inc_j where inc_1 = v_1 and inc_j =
    * v_j when v_j < v_{j-1} (reset: the new counter value IS the
    * increment since the restart) else v_j − v_{j-1}. The complement
    * of [[resets]]: that op counts the breaks, this one heals them.
    *
    * One window pass on the series_id shuffle; increments are exact
    * DECIMAL(18,2) differences and the running sum is an exact
    * decimal cast to double once; adjacency and the cumulative frame
    * are totally ordered by (ts_us, event_id) with an explicit ROWS
    * frame (a RANGE frame would merge tied timestamps). */
  def monotonize(samples: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"), col("event_id"))
    samples
      .withColumn("prev_v", lag(col("value"), 1).over(w))
      .withColumn("inc",
        when(col("prev_v").isNull || col("value") < col("prev_v"),
          col("value").cast(d2))
          .otherwise(col("value").cast(d2) - col("prev_v").cast(d2)))
      .withColumn("adjusted",
        sum(col("inc")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select(col("series_id"), col("ts_us"), col("event_id"), col("value"),
        col("adjusted"))
  }

  /** HA-pair replica deduplication (the Thanos/Cortex query-time
    * dedup for doubly-scraped Prometheus pairs): given samples tagged
    * with a `replica` label, each (series, window) picks ONE replica —
    * the one with more samples (fewer scrape gaps), ties to the
    * lexically smaller replica — and the report shows per (series,
    * replica) how many windows it won and how many samples it
    * contributed to the merged view. The window grain is the
    * switchover penalty: dedup never interleaves replicas inside a
    * window, mirroring Thanos's penalty-based picker at bucket grain.
    *
    * Scale shape: ONE pass collapses samples to (series, window,
    * replica) counts via map-side partial aggregation; the pick
    * window partitions by (series, window) — ≤ #replicas rows per
    * partition by construction, unskewable; the report is a rollup of
    * the picked rows. */
  def haDedup(replicas: DataFrame, windowUs: Long = 3600000000L): DataFrame = {
    val c = replicas
      .groupBy(col("series_id"), col("replica"),
        expr(s"ts_us div $windowUs").as("w"))
      .agg(count(lit(1)).as("n"))
    val pick = Window.partitionBy(col("series_id"), col("w"))
      .orderBy(col("n").desc, col("replica").asc)
    c.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .groupBy(col("series_id"), col("replica"))
      .agg(count(lit(1)).as("n_windows_won"), sum(col("n")).as("n_samples"))
  }

  /** PromQL `changes()`: number of adjacent sample pairs whose value
    * differs, per series. Same plan shape as [[resets]]. */
  def changes(samples: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"), col("event_id"))
    samples
      .withColumn("prev_v", lag(col("value"), 1).over(w))
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(when(col("prev_v").isNotNull && col("value") =!= col("prev_v"), 1L)
          .otherwise(0L)).as("n_changes"))
  }

  /** PromQL `stddev_over_time()` (population): moments from ONE
    * decimal-exact aggregation pass (sum + sum of squares are
    * order-independent in DECIMAL), then double math in a fixed
    * expression shape — bit-identical across engines and partitionings.
    * Negative variance from float cancellation clamps to 0. */
  def stddevOverTime(samples: DataFrame): DataFrame =
    samples
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        exactSum(col("value"), 6).as("s1"),
        exactSum(col("value") * col("value"), 6).as("s2"))
      .select(
        col("series_id"), col("n_points"),
        (col("s1") / col("n_points")).as("avg_value"),
        sqrt(greatest(
          col("s2") / col("n_points") -
            (col("s1") / col("n_points")) * (col("s1") / col("n_points")),
          lit(0.0))).as("stddev_value"))

  /** Robust per-series anomaly flags via MEDIAN absolute deviation —
    * the outlier detector that survives what breaks the z-score: a
    * single extreme point inflates the mean AND the stddev enough to
    * hide itself, while the median and MAD barely move. Two R-7
    * percentile aggregations (median of values, median of absolute
    * deviations) with the per-series medians joined back; flags
    * |x − med| > k·MAD. Constant series (MAD = 0) emit nothing.
    * Determinism: both medians carry the percentile 6dp tolerance;
    * deviations and the score are fixed IEEE expressions over
    * bit-equal operands. */
  def madOutliers(samples: DataFrame, k: Double = 3.0): DataFrame = {
    val med = samples.groupBy(col("series_id"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
    val dev = samples.join(med, "series_id")
      .select(col("series_id"), col("ts_us"), col("value"), col("med"),
        abs(col("value") - col("med")).as("adev"))
    val mad = dev.groupBy(col("series_id"))
      .agg(round(expr("percentile(adev, 0.5)"), 6).as("mad"))
    dev.join(mad, "series_id")
      .filter(col("mad") > 0 && col("adev") > lit(k) * col("mad"))
      .select(col("series_id"), col("ts_us"), col("value"), col("med"),
        col("mad"), (col("adev") / col("mad")).as("score"))
  }

  /** PromQL `count_over_time` / `min_over_time` / `max_over_time` on
    * one range vector: a single aggregation pass per series over
    * [startUs, endUs]. count/min/max are all associative and
    * duplicate-order-insensitive, so partial (map-side) aggregation
    * reduces the shuffle to one row per (partition, series) at any
    * corpus scale; the range filter prunes at the scan. */
  def overTimeStats(samples: DataFrame, startUs: Long, endUs: Long): DataFrame =
    rangeBound(samples, startUs, endUs)
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        exactSum(col("value"), 2).as("sum_value"))
      .withColumn("avg_value", col("sum_value") / col("n_points"))

  /** PromQL `absent()` over a range: catalog series with NO sample in
    * [startUs, endUs]. The present set is a range-pruned distinct of
    * series ids — tiny next to the catalog — so the anti-join
    * broadcasts at any corpus scale. */
  def absent(catalog: DataFrame, samples: DataFrame, startUs: Long, endUs: Long): DataFrame =
    catalog.join(
      broadcast(rangeBound(samples, startUs, endUs)
        .select("series_id").distinct()),
      Seq("series_id"), "left_anti")

  /** Per-series least-squares regression (PromQL `deriv` /
    * `predict_linear`). x = whole seconds since `t0Us` (integer —
    * exact), y = value through the engine-wide DECIMAL(28,2) cast. All
    * five sufficient statistics (n, Σx, Σy, Σxy, Σx²) aggregate
    * EXACTLY (integer/decimal, order-independent); slope / intercept /
    * prediction are then computed in double with one fixed expression
    * shape, so the result is bit-identical across engines regardless
    * of partitioning. Single aggregation pass, no window.
    *
    * `predict_linear(…, horizonS)` evaluates the fit at
    * (last sample + horizon), PromQL-style. */
  def linreg(samples: DataFrame, t0Us: Long, horizonS: Long = 3600L): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val xyDec = org.apache.spark.sql.types.DecimalType(28, 0)
    val agg = samples
      .select(
        col("series_id"),
        (expr("ts_us div 1000000") - lit(t0Us / 1000000L)).as("x"),
        col("value").cast(dec).as("y"))
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_points"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(org.apache.spark.sql.types.DecimalType(10, 0)) * col("y")).as("sxy"),
        sum((col("x") * col("x")).cast(xyDec)).as("sxx"),
        max(col("x")).as("x_last"))
    agg.select(
      col("series_id"), col("n_points"),
      (col("n_points") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")).as("num"),
      (col("n_points") * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double")).as("den"),
      (col("sy").cast("double") / col("n_points")).as("y_bar"),
      (col("sx").cast("double") / col("n_points")).as("x_bar"),
      col("x_last"))
      .withColumn("slope_per_sec",
        when(col("den") > 0, col("num") / col("den")).otherwise(lit(0.0)))
      .withColumn("predicted",
        col("y_bar") + col("slope_per_sec") * (col("x_last") + horizonS - col("x_bar")))
      .select("series_id", "n_points", "slope_per_sec", "predicted", "x_last")
  }

  /** Forecast BACKTEST — the eval harness for the [[linreg]] family
    * (the same before-you-trust-it pattern as the ANN recall evals):
    * per series, the first `trainPct`% of hourly buckets fit a
    * least-squares line and the held-out tail scores it — MAE and
    * RMSE of the linear forecast against what actually happened. The
    * target is the HOURLY SUM (exact DECIMAL — a mean would be a
    * derived double whose re-aggregation is order-dependent); series
    * need ≥2 train and ≥1 test buckets or they drop.
    *
    * Scale shape: one bucket aggregation (map-side partials), one
    * per-series rank window on the BUCKET frame (bounded by
    * retention hours, not sample count), then two series-grain
    * aggregations. Fit arithmetic is the [[linreg]] recipe: exact
    * integer/DECIMAL sufficient statistics, slope/intercept in one
    * fixed double shape; test errors round |e| and e² to 6dp DECIMAL
    * before their exact sums, and the final MAE/RMSE divisions stay
    * raw IEEE (§4). */
  def forecastBacktest(samples: DataFrame, bucketUs: Long = 3600000000L,
                       trainPct: Int = 80): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val b = samples
      .groupBy(col("series_id"), expr(s"ts_us div $bucketUs").as("h"))
      .agg(sum(col("value").cast(d2)).cast(d2).as("y"))
    val stats = b.groupBy(col("series_id"))
      .agg(count(lit(1)).as("nb"), min(col("h")).as("h0"))
    val w = Window.partitionBy(col("series_id")).orderBy(col("h"))
    val xb = b.join(stats, "series_id")
      .withColumn("x", col("h") - col("h0"))
      .withColumn("rn", row_number().over(w))
      .withColumn("ntr", expr(s"nb * $trainPct div 100"))
      .filter(col("ntr") >= 2 && col("nb") - col("ntr") >= 1)
      // deliberately UNPAIRED persist: train fit + test scoring both
      // read it lazily (no unpersist point); session-shared via
      // CacheManager subtree match (the rfm/ppl_bucket idiom)
      .persist()
    val fit = xb.filter(col("rn") <= col("ntr"))
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_train"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast(org.apache.spark.sql.types.DecimalType(10, 0)) * col("y")).as("sxy"),
        sum((col("x") * col("x")).cast(org.apache.spark.sql.types.DecimalType(28, 0))).as("sxx"))
      .select(col("series_id"), col("n_train"),
        (col("n_train") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")).as("num"),
        (col("n_train") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")).as("den"),
        (col("sy").cast("double") / col("n_train")).as("y_bar"),
        (col("sx").cast("double") / col("n_train")).as("x_bar"))
      .withColumn("slope", when(col("den") > 0, col("num") / col("den")).otherwise(lit(0.0)))
      .withColumn("intercept", col("y_bar") - col("slope") * col("x_bar"))
    val e = col("y").cast("double") -
      (col("intercept") + col("slope") * col("x").cast("double"))
    xb.filter(col("rn") > col("ntr"))
      .join(fit, "series_id")
      .groupBy(col("series_id"))
      .agg(
        max(col("n_train")).as("n_train"),
        count(lit(1)).as("n_test"),
        max(col("slope")).as("slope"),
        sum(round(abs(e), 6).cast(d6)).as("sae"),
        sum(round(e * e, 6).cast(d6)).as("see"))
      .select(col("series_id"), col("n_train"), col("n_test"), col("slope"),
        (col("sae").cast("double") / col("n_test").cast("double")).as("mae"),
        sqrt(col("see").cast("double") / col("n_test").cast("double")).as("rmse"))
  }

  /** PromQL binary operation with vector matching — `a / b` with
    * `on(user_id)` over fixed time buckets (e.g.
    * `sum(purchase) / sum(click)` per user per hour). The naive
    * realization is two aggregations + an equi-join; this is the
    * 100 TB shape: ONE conditional aggregation pass over the union of
    * both selectors (map-side partial, single shuffle, no join at
    * all). PromQL inner-match semantics: rows emit only where BOTH
    * sides have samples. */
  def vectorRatio(samples: DataFrame, numType: String, denType: String,
                  bucketMs: Long = 3600000L): DataFrame = {
    val bucketUs = bucketMs * 1000
    samples
      .filter(col("event_type").isin(numType, denType))
      .groupBy(col("user_id"), (expr(s"ts_us div $bucketUs") * bucketMs).as("bucket_ms"))
      .agg(
        sum(when(col("event_type") === numType, 1L).otherwise(0L)).as("n_num"),
        sum(when(col("event_type") === denType, 1L).otherwise(0L)).as("n_den"),
        sum(when(col("event_type") === numType,
          col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))).cast("double")
          .as("num_value"),
        sum(when(col("event_type") === denType,
          col("value").cast(org.apache.spark.sql.types.DecimalType(28, 2)))).cast("double")
          .as("den_value"))
      .filter(col("n_num") > 0 && col("n_den") > 0 && col("den_value") =!= 0.0)
      .select(col("user_id"), col("bucket_ms"), col("num_value"), col("den_value"),
        (col("num_value") / col("den_value")).as("ratio"))
  }

  /** Product-analytics engagement: per observed day, the distinct
    * active users (DAU) and the trailing-7-day distinct count (WAU7)
    * with the DAU/WAU stickiness ratio. A trailing window over
    * DISTINCT users can't ride a rolling sum, and the naive shape
    * (per-day self-join over a 7-day range) is a range join; here
    * each distinct (day, user) pair EMITS the 7 target days it
    * contributes to — a bounded ×7 map-side fan-out — and the rest is
    * one distinct + one count aggregation, both partial-aggregated.
    * Days with no events appear in neither frame (inner join). */
  def engagement(samples: DataFrame): DataFrame = {
    val du = samples
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = du
      .select(explode(sequence(col("day"), col("day") + 6)).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau7"))
    dau.join(wau, "day")
      .withColumn("stickiness", col("dau").cast("double") / col("wau7"))
  }

  /** PromQL subquery composition —
    * `max_over_time(rate(m[inner])[range:inner])` per outer bucket:
    * an inner per-(series, inner-step) counter rate (first/last via
    * struct min/max — ONE aggregation pass, no window sort), then the
    * max rate per outer bucket. The second aggregation runs over the
    * already-reduced inner frame (one row per series-step), so the
    * subquery costs one fact shuffle plus a shuffle of the tiny rate
    * frame — not the two full window sorts the PromQL engine's
    * nested-evaluation model implies. (ref: PromQL subqueries,
    * public spec; reference query surface src/db.rs:205-263.) */
  def subqueryMaxRate(samples: DataFrame, innerMs: Long = 300000L,
                      outerMs: Long = 3600000L): DataFrame = {
    require(outerMs % innerMs == 0, s"outer $outerMs must be a multiple of inner $innerMs")
    val innerUs = innerMs * 1000
    val perOuter = outerMs / innerMs
    samples
      .groupBy(col("series_id"), expr(s"ts_us div $innerUs").as("w"))
      .agg(
        min(struct(col("ts_us"), col("event_id"), col("value"))).as("f"),
        max(struct(col("ts_us"), col("event_id"), col("value"))).as("l"))
      .select(
        col("series_id"),
        (expr(s"w div $perOuter") * outerMs).as("bucket_ms"),
        when(col("l.ts_us") > col("f.ts_us"),
          (col("l.value") - col("f.value")) /
            ((col("l.ts_us") - col("f.ts_us")) / lit(1000000.0)))
          .otherwise(lit(0.0)).as("r"))
      .groupBy(col("series_id"), col("bucket_ms"))
      .agg(count(lit(1)).as("n_windows"), max(col("r")).as("max_rate"))
  }

  /** PromQL offset arithmetic — `sum_over_time(m[1h]) /
    * sum_over_time(m[1h] offset 1d)` (day-over-day comparison at
    * every hour). The naive realization self-joins the hourly frame
    * on (series, bucket − offset), re-shuffling both sides; here each
    * hourly row EMITS itself twice — at its own bucket as the
    * numerator and at bucket+offset as the denominator — so the
    * offset match is a re-aggregation of the already-reduced hourly
    * frame (bounded ×2 fan-out, one extra small shuffle, no join).
    * Inner-match semantics: only buckets where both sides exist and
    * the earlier sum is nonzero. */
  def offsetRatio(samples: DataFrame, bucketMs: Long = 3600000L,
                  offsetMs: Long = 86400000L): DataFrame = {
    val bucketUs = bucketMs * 1000
    val hourly = samples
      .groupBy(col("series_id"), (expr(s"ts_us div $bucketUs") * bucketMs).as("bucket_ms"))
      .agg(exactSum(col("value"), 2).as("s"))
    hourly
      .select(col("series_id"), explode(array(
        struct(col("bucket_ms"),
          col("s").as("cur"), lit(null).cast("double").as("prev")),
        struct((col("bucket_ms") + offsetMs).as("bucket_ms"),
          lit(null).cast("double").as("cur"), col("s").as("prev")))).as("e"))
      .select(col("series_id"), col("e.bucket_ms").as("bucket_ms"),
        col("e.cur").as("cur"), col("e.prev").as("prev"))
      .groupBy(col("series_id"), col("bucket_ms"))
      .agg(max(col("cur")).as("cur_sum"), max(col("prev")).as("prev_sum"))
      .filter(col("cur_sum").isNotNull && col("prev_sum").isNotNull &&
        col("prev_sum") =!= 0.0)
      .withColumn("ratio", col("cur_sum") / col("prev_sum"))
  }

  /** Daily churn rollup: of the users active on day d, how many never
    * appear on day d+1 (day grain — at this corpus's ~2 events/user/
    * day a weekly grain never fires, the vacuous-match trap). The
    * day-over-day "present tomorrow?" lookup is NOT a self-join of
    * the activity frame — each distinct (user, day) EMITS itself
    * twice map-side (at its own day as `cur`, and at day−1 as the
    * `nxt` witness), so one re-aggregation answers both questions
    * (the ts_offset_ratio fixed-lag-emit idiom applied to retention).
    * The trailing data day is excluded (its tomorrow is unobserved);
    * the max-day scalar comes from a ts-only column-pruned scan — a
    * scalar statistic never justifies re-running the distinct. */
  def churn(events: DataFrame): DataFrame = {
    val uw = Series.samples(events)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val marks = uw
      .select(col("user_id"), explode(array(
        struct(col("day").as("day"), lit(1L).as("cur"), lit(0L).as("nxt")),
        struct((col("day") - 1).as("day"), lit(0L).as("cur"), lit(1L).as("nxt")))).as("e"))
      .select(col("user_id"), col("e.day").as("day"),
        col("e.cur").as("cur"), col("e.nxt").as("nxt"))
      .groupBy(col("day"), col("user_id"))
      .agg(max(col("cur")).as("cur"), max(col("nxt")).as("nxt"))
    val maxDay = Series.samples(events)
      .agg(max(expr("ts_us div 86400000000")).as("max_day"))
    marks.crossJoin(broadcast(maxDay))
      .filter(col("cur") === 1L && col("day") < col("max_day"))
      .groupBy(col("day"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(when(col("nxt") === 0L, 1L).otherwise(0L)).as("n_churned"))
      .withColumn("churn_rate", col("n_churned").cast("double") / col("n_active"))
  }

  /** RFM segmentation (recency / frequency / monetary, the classic
    * customer-value grid): one per-user aggregation pass over events,
    * then quartile scores against three rounded R-7 percentile cuts
    * broadcast back (the ppl_bucket pattern — a scalar statistic
    * never justifies a second shuffle, and a global ntile would be a
    * global sort at corpus scale). Raw metrics compare against
    * ROUNDED cuts: metrics are exact integers / decimal-derived
    * doubles, cuts carry the percentile 6dp tolerance, so every
    * comparison is engine-deterministic. Higher score = better
    * customer (recent / frequent / high-spend). */
  def rfm(events: DataFrame, nowUs: Long): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
    val per = Series.samples(events)
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", col("ts_us"))).as("last_buy_us"),
        count(lit(1)).as("frequency"),
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(0.0).cast(d2)).cast(d2).as("mon_dec"))
      // hour grain: every user here is active daily, so day-grain
      // recency since ANY event is a constant (vacuous quartiles);
      // hours since the last PURCHASE is the axis with real spread.
      // Never-purchased users keep NULL recency and score 1 below.
      .withColumn("recency_hours", expr(s"(${nowUs}L - last_buy_us) div 3600000000"))
      .withColumn("monetary", col("mon_dec").cast("double"))
      // cut aggregate + score projection both read it; session-shared
      // via CacheManager subtree match (the ppl_bucket/dedup-family
      // idiom — Bench clears per family, callers clearCache per job)
      .persist()
    val cuts = per.agg(
      round(expr("percentile(recency_hours, 0.25)"), 6).as("r25"),
      round(expr("percentile(recency_hours, 0.50)"), 6).as("r50"),
      round(expr("percentile(recency_hours, 0.75)"), 6).as("r75"),
      round(expr("percentile(frequency, 0.25)"), 6).as("f25"),
      round(expr("percentile(frequency, 0.50)"), 6).as("f50"),
      round(expr("percentile(frequency, 0.75)"), 6).as("f75"),
      round(expr("percentile(monetary, 0.25)"), 6).as("m25"),
      round(expr("percentile(monetary, 0.50)"), 6).as("m50"),
      round(expr("percentile(monetary, 0.75)"), 6).as("m75"))
    def up(v: Column, a: Column, b: Column, c: Column): Column =
      lit(1L) + (v > a).cast("long") + (v > b).cast("long") + (v > c).cast("long")
    per.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("recency_hours"), col("frequency"), col("monetary"),
        (lit(1L) + coalesce((col("recency_hours") < col("r25")).cast("long"), lit(0L))
          + coalesce((col("recency_hours") < col("r50")).cast("long"), lit(0L))
          + coalesce((col("recency_hours") < col("r75")).cast("long"), lit(0L))).as("r_score"),
        up(col("frequency"), col("f25"), col("f50"), col("f75")).as("f_score"),
        up(col("monetary"), col("m25"), col("m50"), col("m75")).as("m_score"))
  }

  /** Strict-order three-step funnel (view → click → purchase): first
    * view per user anchors the funnel, the first click within
    * `stepUs` AFTER it is step 2, the first purchase within `stepUs`
    * after THAT click is step 3 (unbounded steps all convert on a
    * corpus this dense — the vacuous-match trap; 24h windows leave
    * all three outcomes populated). Two min-after-anchor joins on
    * user_id — the anchor frames are user-grain (corpus-reduced),
    * the event sides are single-type filtered scans, and every join
    * is hash-keyed on user_id (no theta-join; the sequencing lives
    * in the conditional min). */
  def funnel3(events: DataFrame,
              stepUs: Long = 24L * 3600L * 1000000L): DataFrame = {
    val sm = Series.samples(events)
    val views = sm.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("view_us"))
    val clicks = sm.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"))
    val s2 = views.join(clicks, Seq("user_id"), "left")
      .withColumn("ok", when(col("ts_us") >= col("view_us")
        && col("ts_us") <= col("view_us") + stepUs, col("ts_us")))
      .groupBy(col("user_id"), col("view_us"))
      .agg(min(col("ok")).as("click_us"))
    val purchases = sm.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"))
    s2.join(purchases, Seq("user_id"), "left")
      .withColumn("ok", when(col("ts_us") >= col("click_us")
        && col("ts_us") <= col("click_us") + stepUs, col("ts_us")))
      .groupBy(col("user_id"), col("view_us"), col("click_us"))
      .agg(min(col("ok")).as("purchase_us"))
      .withColumn("reached",
        lit(1L) + col("click_us").isNotNull.cast("long")
          + col("purchase_us").isNotNull.cast("long"))
  }

  /** Session-shape report over [[sessionize]]'s output: one row of
    * corpus-level statistics (session count, avg events/session as an
    * exact-sum mean, multi-event share, R-7 p95s of length and
    * duration — medians are vacuously the singleton at this event
    * density, p95s are live; the 4h default gap matches the corpus's
    * ~7h median inter-event gap where 30min yields ~1.0 events/
    * session). The aggregation runs over the SESSION frame — already
    * reduced from events by the sessionize shuffle — so the
    * single-row collapse is a partial-aggregated scalar pass, never a
    * second events scan. */
  def sessionStats(events: DataFrame,
                   gapUs: Long = 4L * 3600L * 1000000L): DataFrame =
    sessionize(events, gapUs)
      .withColumn("dur_us", col("end_us") - col("start_us"))
      .agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        (sum(col("n_events")).cast("double") / count(lit(1))).as("avg_events"),
        (sum(when(col("n_events") >= 2, 1L).otherwise(0L)).cast("double")
          / count(lit(1))).as("multi_share"),
        round(expr("percentile(n_events, 0.95)"), 6).as("p95_events"),
        round(expr("percentile(dur_us, 0.95)"), 6).as("p95_dur_us"))

  /** Windowed exponential smoothing (the deterministic, bounded-
    * history cousin of PromQL `holt_winters`): at every sample,
    * ewma = Σ_{j=0..K−1} value_{t−j}·2^{K−1−j} / Σ 2^{K−1−j} — α=1/2
    * decay truncated to the trailing K samples, so weights are exact
    * powers of two and the weighted sum rides exact DECIMAL (the
    * unbounded recurrence has no scale-clean form: recursive state
    * breaks partial aggregation, and float accumulation breaks
    * order-independence).
    *
    * Plan shape: one row_number window per series (the per-series
    * sort every ordered operator pays), then each sample EMITS its
    * K=16 weighted contributions map-side to the ROWS it influences
    * (the gapFill/offset emit idiom — never a K-wide window of
    * per-distance weights, which window frames cannot express); one
    * re-aggregation keyed (series, target) folds them, and the j=0
    * self-contribution carries ts/value so no join-back is needed. */
  def ewma(samples: DataFrame, k: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"), col("event_id"))
    samples
      .select(col("series_id"), col("ts_us"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .select(col("series_id"), col("rn"), col("ts_us"), col("value"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("series_id"), (col("rn") + col("j")).as("target"),
        expr(s"cast(power(2, ${k - 1} - j) as bigint)").as("w"),
        when(col("j") === 0, col("ts_us")).as("self_ts"),
        when(col("j") === 0, col("value")).as("self_value"),
        col("value"))
      .groupBy(col("series_id"), col("target"))
      .agg(
        max(col("self_ts")).as("ts_us"),
        max(col("self_value")).as("value"),
        sum(col("value").cast(d2) * col("w")).cast("double").as("num"),
        sum(col("w")).as("den"))
      .filter(col("ts_us").isNotNull)
      .select(col("series_id"), col("ts_us"), col("value"),
        (col("num") / col("den")).as("ewma"))
  }

  /** Revenue concentration report ("do 10% of users carry the
    * business"): one per-user purchase aggregation, the p90 revenue
    * cut broadcast back (the rfm/ppl_bucket scalar pattern), and a
    * single-row rollup of the top-decile user / revenue / purchase
    * shares. Exact DECIMAL revenue throughout; the only doubles are
    * the final share divisions over identical operands. */
  def powerUsers(events: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
    val per = Series.samples(events)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(d2)).cast(d2).as("rev_dec"))
      .withColumn("revenue", col("rev_dec").cast("double"))
      // cut aggregate + rollup both read it (same session-cache idiom
      // as rfm/ppl_bucket; Bench clears per family)
      .persist()
    val cut = per.agg(round(expr("percentile(revenue, 0.9)"), 6).as("c90"))
    per.crossJoin(broadcast(cut))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("revenue") > col("c90"), 1L).otherwise(0L)).as("n_top_users"),
        sum(col("rev_dec")).cast(d2).as("tot_dec"),
        sum(when(col("revenue") > col("c90"), col("rev_dec"))).cast(d2).as("top_dec"),
        sum(col("n_purchases")).as("tot_purch"),
        sum(when(col("revenue") > col("c90"), col("n_purchases"))
          .otherwise(0L)).as("top_purch"))
      .select(col("n_users"), col("n_top_users"),
        col("tot_dec").cast("double").as("total_revenue"),
        (col("top_dec").cast("double") / col("tot_dec").cast("double")).as("top_revenue_share"),
        (col("top_purch").cast("double") / col("tot_purch")).as("top_purchase_share"))
  }

  /** A/B experiment readout with CUPED variance reduction (Deng et
    * al., WSDM'13 — the pre-experiment-covariate adjustment every
    * mature experimentation platform applies): users split into two
    * variants by id parity; the event-time span halves into a
    * pre-period (the covariate window) and a post-period (the
    * experiment window); each user's pre-metric X and post-metric Y
    * are exact DECIMAL value sums; θ = cov(X,Y)/var(X) is fit POOLED
    * across variants (the standard unbiased recipe — assignment is
    * independent of X), and the adjusted metric is Y−θ(X−mean(X)).
    * Output per variant: user count, raw and adjusted mean/variance,
    * and the variance-reduction ratio the experimenter reads to see
    * how much sensitivity CUPED bought.
    *
    * Scale shape: ONE user-grain aggregation (the required shuffle),
    * then ONE variant-grain pass collapsing to exact sufficient
    * moments (n, Σx, Σy, Σxx, Σxy, Σyy — map-side partials absorb
    * everything); the adjusted-metric moments come from the ALGEBRAIC
    * expansion Σ(y−θx)² = Σyy − 2θΣxy + θ²Σxx on the 2-row frame, so
    * there is no second corpus pass and no per-user persist. At a
    * billion users this is two hash aggregations and a 2-row join.
    *
    * Determinism: per-user metrics and all six moments are exact
    * DECIMAL sums; θ and mean(X) round to 6dp before use; every
    * derived statistic computes in ONE fixed IEEE shape from those
    * exact moments and rounds to 6dp. */
  def abCuped(events: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val s = Series.samples(events)
    val span = s.agg(expr("(min(ts_us) + max(ts_us)) div 2").as("mid_us"))
    val per = s.crossJoin(broadcast(span))
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts_us") < col("mid_us"), col("value").cast(d2))),
          lit(0).cast(d2)).as("x"),
        coalesce(sum(when(col("ts_us") >= col("mid_us"), col("value").cast(d2))),
          lit(0).cast(d2)).as("y"))
    val mom = per
      .groupBy(pmod(col("user_id"), lit(2L)).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      // ≤2 rows, but its lineage is the user-grain pass — the pooled
      // fit and the final readout both consume it (session-cache idiom)
      .persist()
    val pooled = mom.agg(
      sum(col("n")).cast("double").as("np"),
      sum(col("sx")).cast("double").as("sxp"), sum(col("sy")).cast("double").as("syp"),
      sum(col("sxx")).cast("double").as("sxxp"), sum(col("sxy")).cast("double").as("sxyp"))
    val fit = broadcast(pooled.select(
      when(col("np") * col("sxxp") - col("sxp") * col("sxp") === 0.0, lit(0.0))
        .otherwise(round((col("np") * col("sxyp") - col("sxp") * col("syp"))
          / (col("np") * col("sxxp") - col("sxp") * col("sxp")), 6)).as("theta"),
      round(col("sxp") / col("np"), 6).as("mx")))
    val n = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxx, sxy, syy) =
      (col("sxx").cast("double"), col("sxy").cast("double"), col("syy").cast("double"))
    val saa = syy - lit(2.0) * col("theta") * sxy + col("theta") * col("theta") * sxx
    val sa = sy - col("theta") * sx
    mom.crossJoin(fit)
      .select(col("variant"), col("n").as("n_users"),
        round(sy / n, 6).as("mean_y"),
        round(syy / n - (sy / n) * (sy / n), 6).as("var_y"),
        round(sy / n - col("theta") * (sx / n - col("mx")), 6).as("mean_y_adj"),
        round(saa / n - (sa / n) * (sa / n), 6).as("var_y_adj"),
        col("theta"))
      .withColumn("var_reduction",
        when(col("var_y") > 0.0,
          round(lit(1.0) - col("var_y_adj") / col("var_y"), 6)))
  }

  /** Sample-ratio-mismatch guard for the [[abCuped]] experiment split
    * (the FIRST check an experimentation platform runs — a biased
    * assignment invalidates every downstream readout): under the
    * intended 50/50 id-parity split, z = (n₀−n₁)/√(n₀+n₁) is
    * approximately standard normal, and |z| > 3 flags the split as
    * broken. One user-grain distinct pass + a 2-row pivot; the z
    * arithmetic is one fixed IEEE shape over exact counts. */
  def abSrm(events: DataFrame): DataFrame = {
    val n = Series.samples(events)
      .select(col("user_id")).distinct()
      .groupBy(pmod(col("user_id"), lit(2L)).as("variant"))
      .agg(count(lit(1)).as("n"))
    n.agg(
        coalesce(sum(when(col("variant") === 0, col("n"))), lit(0L)).as("n_a"),
        coalesce(sum(when(col("variant") === 1, col("n"))), lit(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        (col("n_a").cast("double") / (col("n_a") + col("n_b")).cast("double")).as("share_a"),
        ((col("n_a").cast("double") - col("n_b").cast("double"))
          / sqrt((col("n_a") + col("n_b")).cast("double"))).as("z"))
      .withColumn("srm_flag", abs(col("z")) > 3.0)
  }

  /** Growth accounting (the new / retained / resurrected / churned
    * decomposition every growth team reads): per day, users seen for
    * the first time, users also active the previous day, users
    * returning after a gap, and — attributed to their LAST active day,
    * matching [[churn]] — users who don't appear tomorrow. Presence
    * lookups ride a THREE-way map-side emit over the distinct
    * (user, day) frame (self + prev-day witness + next-day witness —
    * the fixed-lag-emit idiom twice over); first-seen day is a
    * user-grain aggregate joined back by key; day bounds come from a
    * ts-only scalar scan. DAU = new + retained + resurrected by
    * construction. */
  def growthAccounting(events: DataFrame): DataFrame = {
    val ud = Series.samples(events)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val marks = ud
      .select(col("user_id"), explode(array(
        struct(col("day").as("day"), lit(1L).as("cur"), lit(0L).as("prv"), lit(0L).as("nxt")),
        struct((col("day") + 1).as("day"), lit(0L).as("cur"), lit(1L).as("prv"), lit(0L).as("nxt")),
        struct((col("day") - 1).as("day"), lit(0L).as("cur"), lit(0L).as("prv"), lit(1L).as("nxt")))).as("e"))
      .select(col("user_id"), col("e.day").as("day"),
        col("e.cur").as("cur"), col("e.prv").as("prv"), col("e.nxt").as("nxt"))
      .groupBy(col("day"), col("user_id"))
      .agg(max(col("cur")).as("cur"), max(col("prv")).as("prv"), max(col("nxt")).as("nxt"))
    val maxDay = Series.samples(events)
      .agg(max(expr("ts_us div 86400000000")).as("max_day"))
    marks.join(first, "user_id")
      .crossJoin(broadcast(maxDay))
      .filter(col("cur") === 1L)
      .groupBy(col("day"))
      .agg(
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("prv") === 1L, 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("prv") === 0L && col("day") > col("first_day"), 1L)
          .otherwise(0L)).as("n_resurrected"),
        max(col("max_day")).as("max_day"),
        sum(when(col("nxt") === 0L, 1L).otherwise(0L)).as("churn_raw"))
      .select(col("day"), col("n_new"), col("n_retained"), col("n_resurrected"),
        when(col("day") < col("max_day"), col("churn_raw")).as("n_churned"))
  }

  /** Pearson correlation matrix between event-type HOURLY volume
    * series — "do errors spike with purchases?" — from exact integer
    * sufficient statistics. The pairwise match is NOT a self-join of
    * the hourly frame (the transitions lesson: a self-join re-runs
    * the upstream aggregation per side): each hour collapses to ONE
    * row carrying its per-type counts (collect_list bounded by the
    * type cardinality), and the type×type pairs explode MAP-SIDE from
    * that row (the emb_covariance within-row pairing idiom). The five
    * cross-moments sum in exact DECIMAL; r is computed once in double
    * from the six scalars — identical operands, identical expression,
    * bit-equal on any engine. Pairs appear only for hours where both
    * types have samples (inner-match semantics). */
  def corrMatrix(events: DataFrame): DataFrame = {
    val d0 = org.apache.spark.sql.types.DecimalType(19, 0)
    val perHour = Series.samples(events)
      .groupBy(expr("ts_us div 3600000000").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("hour"))
      .agg(array_sort(collect_list(struct(col("event_type").as("t"), col("cnt").as("c")))).as("xs"))
    val pairs = perHour
      .select(explode(expr(
        """flatten(transform(xs, (a, i) ->
             transform(slice(xs, i + 2, size(xs)), b ->
               struct(a.t AS type_a, b.t AS type_b, a.c AS x, b.c AS y))))""")).as("p"))
      .select(col("p.type_a"), col("p.type_b"),
        col("p.x").cast(d0).as("x"), col("p.y").cast(d0).as("y"))
    pairs.groupBy(col("type_a"), col("type_b"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .withColumn("vx", col("n_hours") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n_hours") * col("syy") - col("sy") * col("sy"))
      .select(col("type_a"), col("type_b"), col("n_hours"),
        when(col("vx") > 0 && col("vy") > 0,
          (col("n_hours") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("vx") * col("vy"))).as("corr"))
  }

  /** THEIL–SEN robust trend per series — the median of all pairwise
    * slopes, the estimator that shrugs off the outliers a least-
    * squares slope (ts_predict_linear's fit) chases: one corrupted
    * day moves OLS by its full leverage but moves a median of
    * C(n,2) slopes barely at all. Computed at DAILY grain so the
    * pair fan-out is bounded by design (≤ C(days,2) ≈ 171 pairs per
    * series on a 19-day corpus — never the raw-sample quadratic):
    * per-(series, day) exact-decimal means, one series-keyed
    * EQUI-join for the day pairs, slope per day-gap in double
    * (identical operands both engines), median via the R-7
    * percentile rounded 6dp (slope magnitudes are O(1-100), so the
    * interpolation's last-ulp drift sits far under the grain — the
    * events_iet magnitude lesson applied at design time). */
  def theilSen(events: DataFrame): DataFrame = {
    val d28 = org.apache.spark.sql.types.DecimalType(28, 6)
    val daily = Series.samples(events)
      .groupBy(col("series_id"), expr("ts_us div 86400000000").as("day"))
      .agg((sum(col("value").cast(d28)).cast("double") / count(lit(1))).as("v"))
      // BOTH sides of the pair self-join below embed this aggregate —
      // without the cache the corpus-scale daily reduction ran twice
      // (r13; §5 — unpaired persist, series×days rows, family-cleared)
      .persist()
    val pairs = daily.alias("a").join(daily.alias("b"),
        col("a.series_id") === col("b.series_id") && col("a.day") < col("b.day"))
      .select(col("a.series_id").as("series_id"),
        ((col("b.v") - col("a.v")) / (col("b.day") - col("a.day")).cast("double"))
          .as("slope"))
    pairs.groupBy(col("series_id"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5)"), 6).as("trend_per_day"))
  }

  /** INTER-EVENT-TIME profile per event type — the dial read before
    * choosing a sessionization gap or rate-limit window, and the
    * bot-traffic tell (machine traffic collapses the IET
    * distribution; human traffic spreads it). Gaps pair CONSECUTIVE
    * events within a series via one PARTITIONED lag window (bounded
    * by per-series volume — the sessionize shape, never a global
    * sort), then aggregate to the type grain: exact-decimal mean,
    * R-7 interpolated p50/p90 (the ts_quantiles recipe, 6dp round
    * absorbing last-ULP libm drift). */
  def interEventTimes(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("series_id")).orderBy(col("ts_us"), col("event_id"))
    Series.samples(events)
      .select(col("event_type"), col("series_id"), col("ts_us"), col("event_id"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_gaps"),
        (sum(col("gap_us").cast(org.apache.spark.sql.types.DecimalType(28, 0)))
          .cast("double") / count(lit(1))).as("mean_gap_us"),
        // percentiles report in SECONDS: the R-7 interpolation's last-
        // ulp drift on ~1e12-us operands (~6e-5 absolute) sits ABOVE a
        // 6dp round's grain at that magnitude, but dividing to seconds
        // first (~1e6) puts the drift at ~6e-11 — far under the 1e-6
        // round grain (found by the gate: DuckDB interpolates
        // lo + f·(hi−lo), Spark (1−f)·lo + f·hi)
        round(expr("percentile(gap_us, 0.5)") / 1000000.0, 6).as("p50_gap_s"),
        round(expr("percentile(gap_us, 0.9)") / 1000000.0, 6).as("p90_gap_s"))
  }

  /** Per-type AUTOCORRELATION of the hourly sample-count series at
    * lags 1..maxLag — the seasonality detector read before trusting a
    * seasonal-naive baseline (ts_forecast_snaive) or a seasonal
    * profile (ts_seasonal_profile): a 24h-periodic series shows the
    * lag-24 peak, a trending one decays slowly, white noise sits near
    * 0. Same determinism as [[corrMatrix]]: exact integer counts →
    * exact decimal sums → ONE double Pearson expression, identical
    * operands on any engine. Scale shape: the lag pairing is an
    * EQUI-join on (event_type, hour + lag) — hashable keys, never a
    * window or a range join; pair volume is n_hours × maxLag per
    * type. Output: (event_type, lag, n_pairs, acf). */
  def acf(events: DataFrame, maxLag: Int = 3): DataFrame =
    acfFromHourly(hourlyTypeCounts(events), maxLag)

  /** The per-(type, hour) sample-count frame every ACF-family operator
    * reads — one map-side-partial hash aggregation over the corpus;
    * everything downstream works on the reduced n_types × n_hours
    * frame (identical subplans dedup through ReuseExchange when a
    * composite like [[ljungBox]] reads it twice). */
  private def hourlyTypeCounts(events: DataFrame): DataFrame = {
    val d0 = org.apache.spark.sql.types.DecimalType(19, 0)
    Series.samples(events)
      .groupBy(col("event_type"), expr("ts_us div 3600000000").as("hour"))
      .agg(count(lit(1)).cast(d0).as("c"))
  }

  private def acfFromHourly(hourly: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val withLag = hourly.select(col("event_type"), col("hour"), col("c"),
      explode(expr(s"sequence(1, $maxLag)")).as("lag"))
    val pairs = withLag.alias("a").join(hourly.alias("b"),
        col("a.event_type") === col("b.event_type") &&
          col("b.hour") === col("a.hour") + col("a.lag"))
      .select(col("a.event_type").as("event_type"), col("a.lag").as("lag"),
        col("a.c").as("x"), col("b.c").as("y"))
    pairs.groupBy(col("event_type"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .withColumn("vx", col("n_pairs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n_pairs") * col("syy") - col("sy") * col("sy"))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        when(col("vx") > 0 && col("vy") > 0,
          (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("vx") * col("vy"))).as("acf"))
  }

  /** [[acf]] pivoted wide — one row per type, lag columns r1..rK.
    * Exactly one acf row exists per (type, lag) with ≥1 pair, so the
    * max-when pivot is a pure reshape; a lag with no pairs (or zero
    * variance) lands NULL. */
  private def acfWide(hourly: DataFrame, maxLag: Int): DataFrame = {
    val pivots = (1 to maxLag)
      .map(k => max(when(col("lag") === k, col("acf"))).as(s"r$k"))
    acfFromHourly(hourly, maxLag).groupBy(col("event_type"))
      .agg(pivots.head, pivots.tail: _*)
  }

  /** PERIODOGRAM at fixed candidate periods — the FREQUENCY-domain
    * seasonality detector next to [[acf]]'s lag-domain one (acf asks
    * "correlated with lag k?"; this asks "how much energy at period
    * P?" — the read that picks WHICH seasonal grain a profile or
    * forecast should use): per type, the squared DFT magnitude of the
    * mean-centered hourly counts at each period,
    * power = (Σ(c−m)·cos θ_h)² + (Σ(c−m)·sin θ_h)², normalized by n.
    *
    * Determinism (§4): the trig values are computed ONCE driver-side
    * (24+12+168 distinct phases) and handed to BOTH engines as
    * LITERALS — the oracle inlines the same shortest-repr doubles —
    * so no JVM-vs-libm cos/sin divergence can enter the gate; terms
    * round to 9dp DECIMAL before the order-free exact sum (the
    * driftPsi ln discipline), and the power is one fixed-shape double
    * expression. Scale: everything past the hourly reduction runs on
    * (n_hours × |periods|) rows with the trig/moment frames broadcast. */
  def periodogram(events: DataFrame,
                  periods: Seq[Int] = Seq(24, 12, 168)): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2), "periods >= 2")
    val spark = events.sparkSession
    import spark.implicits._
    val dec9 = org.apache.spark.sql.types.DecimalType(28, 9)
    val table = trigTable(periods).toDF("period", "pos", "cosv", "sinv")
    val hourly = hourlyTypeCounts(events)
    val nh = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("c")).cast("double").as("s1"))
      .select(col("event_type"), col("n_hours"),
        (col("s1") / col("n_hours")).as("mean"))
    hourly.join(broadcast(nh), "event_type")
      .crossJoin(broadcast(periods.map(_.toLong).toDF("period")))
      .withColumn("pos", pmod(col("hour"), col("period")))
      .join(broadcast(table), Seq("period", "pos"))
      .withColumn("tc",
        round((col("c").cast("double") - col("mean")) * col("cosv"), 9).cast(dec9))
      .withColumn("ts",
        round((col("c").cast("double") - col("mean")) * col("sinv"), 9).cast(dec9))
      .groupBy(col("event_type"), col("period"))
      .agg(max(col("n_hours")).as("n_hours"),
        sum(col("tc")).cast("double").as("sc"),
        sum(col("ts")).cast("double").as("ss"))
      .withColumn("power",
        (col("sc") * col("sc") + col("ss") * col("ss"))
          / col("n_hours").cast("double"))
  }

  /** The driver-side trig table [[periodogram]] shares with its
    * oracle: (period, phase position, cos, sin) at 2π·pos/period. */
  def trigTable(periods: Seq[Int]): Seq[(Long, Long, Double, Double)] =
    periods.flatMap(p => (0 until p).map(k =>
      (p.toLong, k.toLong,
        math.cos(2 * math.Pi * k / p), math.sin(2 * math.Pi * k / p))))

  /** NEXT-STEP ENTROPY per state of the user-journey chain — the
    * predictability dial over [[transitions]] (a near-zero state is
    * a funnel or a bot signature — the next step is forced; a
    * near-ln(n_dest) state is a genuine decision point): the
    * conditional Shannon entropy −Σ_j p_ij ln p_ij in nats. Terms
    * round 9dp before the exact decimal sum (the driftPsi ln
    * discipline), 6dp final; runs entirely on the ≤|types|² reduced
    * transition frame. */
  def markovEntropy(events: DataFrame): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(28, 9)
    transitions(events)
      .withColumn("term", round(col("prob") * log(col("prob")), 9).cast(dec9))
      .groupBy(col("from_type"))
      .agg(
        sum(col("n")).as("n_out"),
        count(lit(1)).as("n_dest"),
        round(-sum(col("term")).cast("double"), 6).as("entropy_nats"))
  }

  /** LJUNG–BOX portmanteau test (Ljung & Box, Biometrika 1978) on the
    * per-type hourly count series — the is-it-white-noise DECISION
    * layered on [[acf]]'s dial:
    *   Q = n(n+2) · Σ_{k=1..m} ρ_k² / (n−k)
    * compared against the χ²(m) critical value (`crit` defaults to the
    * 5% point for m=3). A series that rejects has real autocorrelation
    * structure — worth a seasonal profile or a forecast; one that
    * keeps is noise no seasonal-naive baseline will beat.
    *
    * Determinism (§4): ρ_k come from [[acf]]'s one double Pearson
    * expression over exact decimal sums; Q is ONE fixed-shape IEEE
    * expression over those doubles (left-associated term sum, same
    * parse on any engine); `reject` is an integer flag off the same
    * double compare. NULL whenever any ρ_k is NULL (constant series /
    * missing lag) or n ≤ m — never NaN. Scale shape: everything past
    * the one corpus-reducing hourly aggregation runs on n_types-sized
    * frames; the hourly frame feeds both the pair join and the n_hours
    * count (identical subplan → ReuseExchange). */
  def ljungBox(events: DataFrame, maxLag: Int = 3,
               crit: Double = 7.814727903251179): DataFrame = {
    val hourly = hourlyTypeCounts(events)
    val nh = hourly.groupBy(col("event_type")).agg(count(lit(1)).as("n_hours"))
    val nhD = col("n_hours").cast("double")
    val qSum = (1 to maxLag)
      .map(k => col(s"r$k") * col(s"r$k") / (nhD - lit(k)))
      .reduceLeft(_ + _)
    nh.join(acfWide(hourly, maxLag), "event_type")
      .withColumn("q_stat",
        when(col("n_hours") > maxLag, nhD * (nhD + lit(2)) * qSum))
      .withColumn("reject",
        when(col("q_stat").isNotNull,
          when(col("q_stat") > crit, 1L).otherwise(0L)))
      .select(col("event_type") +: col("n_hours") +:
        (1 to maxLag).map(k => col(s"r$k")) :+ col("q_stat") :+ col("reject"): _*)
  }

  /** PARTIAL autocorrelation of the hourly count series at lags 1..3
    * via the Durbin–Levinson recursion closed over [[acf]]'s ρ values
    * — the AR-order dial ([[acf]] says "correlated"; PACF says how
    * many AR lags carry INDEPENDENT information: an AR(p) series cuts
    * off sharply after lag p, trend/seasonality decay instead):
    *   φ11 = ρ1
    *   φ22 = (ρ2 − ρ1²) / (1 − ρ1²)
    *   φ21 = φ11 − φ22·φ11
    *   φ33 = (ρ3 − φ21·ρ2 − φ22·ρ1) / (1 − φ21·ρ1 − φ22·ρ2)
    * Each level is ONE fixed-shape IEEE expression over the previous
    * level's doubles — the engine computes a level once and reuses the
    * VALUE (projection chain here, CTE chain in the oracle), so the
    * recursion is bit-stable across engines (§4). Zero denominators
    * (|ρ1| = 1 alternating series) and NULL ρ propagate to NULL,
    * never Inf/NaN. Fixed at 3 lags: each further level doubles the
    * closed form — past 3 you fit an AR model, not a report. */
  def pacf(events: DataFrame): DataFrame =
    acfWide(hourlyTypeCounts(events), 3)
      .withColumn("pacf1", col("r1"))
      .withColumn("den2", lit(1.0) - col("r1") * col("r1"))
      .withColumn("pacf2",
        when(col("den2") =!= 0.0,
          (col("r2") - col("r1") * col("r1")) / col("den2")))
      .withColumn("phi21", col("pacf1") - col("pacf2") * col("pacf1"))
      .withColumn("den3",
        lit(1.0) - col("phi21") * col("r1") - col("pacf2") * col("r2"))
      .withColumn("pacf3",
        when(col("den3") =!= 0.0,
          (col("r3") - col("phi21") * col("r2") - col("pacf2") * col("r1"))
            / col("den3")))
      .select(col("event_type"), col("r1"), col("r2"), col("r3"),
        col("pacf1"), col("pacf2"), col("pacf3"))

  /** LTTB DOWNSAMPLING per type (Steinarsson 2013, Largest-Triangle-
    * Three-Buckets — the downsampler Grafana-class dashboards run
    * before plotting, because it keeps the VISUALLY load-bearing
    * points: spikes, turns, extremes — where bucket means flatten
    * them): first and last points are kept; the middle splits into
    * `buckets`−2 equal-count buckets; each bucket keeps the point
    * forming the LARGEST TRIANGLE with the previously kept point and
    * the NEXT bucket's centroid. The greedy chain is inherently
    * sequential, so it runs as one in-memory pass per series
    * (flatMapGroups over the REDUCED hourly frame — bounded by
    * retention hours, the Gorilla chunk-pack justification; the
    * corpus-scale work is the hourly aggregation before it).
    *
    * Determinism: the triangle-area comparison is EXACT INTEGER
    * arithmetic — with centroid (sx/cnt, sy/cnt), area×2×cnt =
    * (x_prev·cnt − sx)(y − y_prev) − (x_prev − x)(sy − y_prev·cnt),
    * an integer whose magnitude stays far inside Long at hour/count
    * scales; cnt is constant within a bucket so the argmax is
    * unchanged. Ties break to the lowest x. Series with ≤ `buckets`
    * points pass through whole. Output: (event_type, idx, hour, c),
    * idx 0..buckets−1 in time order. */
  def lttb(events: DataFrame, buckets: Int = 12): DataFrame = {
    require(buckets >= 3, s"buckets must be >= 3, got $buckets")
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = hourlyTypeCounts(events)
      .select(col("event_type"), col("hour").cast("long").as("x"),
        col("c").cast("long").as("y"))
      .as[(String, Long, Long)]
    val b = buckets
    hourly.groupByKey(_._1).flatMapGroups { (tpe, it) =>
      val pts = it.map(r => (r._2, r._3)).toArray.sortInPlace()(
        Ordering.by((p: (Long, Long)) => p._1))
      val n = pts.length
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      if (n <= b) {
        var i = 0
        while (i < n) { out += ((tpe, i.toLong, pts(i)._1, pts(i)._2)); i += 1 }
      } else {
        val mid = b - 2
        val m = (n - 2).toLong
        def segOf(i: Int): Long = (i - 1).toLong * mid / m
        val bySeg = (1 to n - 2).groupBy(segOf)
        var prev = pts(0)
        out += ((tpe, 0L, pts(0)._1, pts(0)._2))
        for (k <- 0 until mid) {
          val (cnt, sx, sy) =
            if (k == mid - 1) (1L, pts(n - 1)._1, pts(n - 1)._2)
            else {
              val nx = bySeg(k + 1L)
              (nx.size.toLong,
                nx.iterator.map(i => pts(i)._1).sum,
                nx.iterator.map(i => pts(i)._2).sum)
            }
          val (xp, yp) = prev
          val best = bySeg(k.toLong).map { i =>
            val (x, y) = pts(i)
            val a = (xp * cnt - sx) * (y - yp) - (xp - x) * (sy - yp * cnt)
            (math.abs(a), x, y)
          }.maxBy(t => (t._1, -t._2))
          prev = (best._2, best._3)
          out += ((tpe, (k + 1).toLong, best._2, best._3))
        }
        out += ((tpe, (b - 1).toLong, pts(n - 1)._1, pts(n - 1)._2))
      }
      out.iterator
    }.toDF("event_type", "idx", "hour", "c")
  }

  /** M4 DOWNSAMPLING per type (Jugel et al., VLDB 2014 — the
    * error-free line-chart reducer: a pixel column's rendering is
    * fully determined by the first/last/min/max of its time bucket,
    * so M4 preserves the drawn line EXACTLY where [[lttb]] preserves
    * perceived shape): per (type, `bucketHours` bucket) the four
    * extremal points of the hourly count series, wide. Unlike LTTB
    * there is no sequential chain — M4 is ONE hash aggregation with
    * map-side partials, the ideal 100 TB shape.
    *
    * Determinism: pure integer PACKING argmins/argmaxes —
    * first/last pack (hour · 2^42 + c) (hour unique per type; c <
    * 2^42 ≈ 4.4e12 counts/hour, documented headroom), min/max pack
    * (c · 2^20 + hour) with the hour field inverted on the max side
    * so value ties break to the EARLIEST hour on both (hour < 2^20
    * holds until 2089). Exact LONGs end to end; no doubles anywhere. */
  def m4(events: DataFrame, bucketHours: Int = 48): DataFrame = {
    require(bucketHours >= 1, s"bucketHours must be >= 1, got $bucketHours")
    val hb = 1L << 20
    val cb = 1L << 42
    val hourly = hourlyTypeCounts(events)
      .select(col("event_type"), col("hour").cast("long").as("hour"),
        col("c").cast("long").as("c"))
    hourly
      .withColumn("bucket", expr(s"hour div $bucketHours"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(
        count(lit(1)).as("n_hours"),
        min(col("hour") * cb + col("c")).as("pf"),
        max(col("hour") * cb + col("c")).as("pl"),
        min(col("c") * hb + col("hour")).as("pn"),
        max(col("c") * hb + (lit(hb - 1) - col("hour"))).as("px"))
      .select(col("event_type"), col("bucket"), col("n_hours"),
        expr(s"pf div $cb").as("t_first"), pmod(col("pf"), lit(cb)).as("v_first"),
        expr(s"pl div $cb").as("t_last"), pmod(col("pl"), lit(cb)).as("v_last"),
        pmod(col("pn"), lit(hb)).as("t_min"), expr(s"pn div $hb").as("v_min"),
        (lit(hb - 1) - pmod(col("px"), lit(hb))).as("t_max"),
        expr(s"px div $hb").as("v_max"))
  }

  /** SEASONAL STRENGTH per type (Hyndman & Athanasopoulos, FPP3
    * §12.2 — the 0..1 dial that says how much of a series the
    * hour-of-day profile explains): 1 − var(residual)/var(total) over
    * the hourly count series, residual = count − its hour-of-day
    * profile mean. Reads ~0 on this corpus's flat synthetic traffic
    * (the honest no-seasonality answer) and ~1 on a clean daily
    * pattern (spec-pinned) — the go/no-go read before trusting
    * ts_seasonal_profile or ts_forecast_snaive. Over PRESENT hours
    * only (a zero-filled variant composes with ts_gap_fill_1h).
    *
    * Determinism (§4, a lesson earned at sf0.1): residuals against a
    * group mean sum to ZERO within their group, so var_resid is the
    * within-group SSE identity
    *   var_resid = (Σ_hod (n_h·Q_h − S_h²)/n_h) / n
    * with n_h·Q_h − S_h² an EXACT decimal integer per group. The
    * first formulation rounded a per-ROW residual double and rolled a
    * Spark-vs-DuckDB round(double) disagreement about once per 10⁵
    * rows; this form rounds only ≤24 group-level rationals per type
    * (9dp — the driftPsi risk class) and var_total needs NO rounding
    * at all (one exact integer numerator, two divisions). Strength
    * clamps at 0 (a profile can overfit thin cells). */
  def seasonalStrength(events: DataFrame): DataFrame = {
    val d9 = org.apache.spark.sql.types.DecimalType(28, 9)
    val hourly = hourlyTypeCounts(events).withColumn("hod", col("hour") % 24)
    val grp = hourly.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_h"), sum(col("c")).as("s_h"),
        sum(col("c") * col("c")).as("q_h"))
      .withColumn("sse9",
        round((col("n_h") * col("q_h") - col("s_h") * col("s_h"))
          .cast("double") / col("n_h"), 9).cast(d9))
    grp.groupBy(col("event_type"))
      .agg(
        sum(col("n_h")).as("n_hours"),
        sum(col("s_h")).as("s1"),
        sum(col("q_h")).as("q1"),
        sum(col("sse9")).cast("double").as("ssr"))
      .select(col("event_type"), col("n_hours"),
        ((col("n_hours") * col("q1") - col("s1") * col("s1")).cast("double")
          / col("n_hours") / col("n_hours")).as("var_total"),
        (col("ssr") / col("n_hours")).as("var_resid"))
      .withColumn("strength",
        when(col("var_total") > 0.0,
          greatest(lit(0.0), lit(1.0) - col("var_resid") / col("var_total"))))
  }

  /** SAX symbolic segments per type (Lin, Keogh et al., DMKD'07 —
    * the symbolic series representation behind iSAX indexing and
    * motif mining): the hourly count series splits into `w`
    * equal-count segments (PAA), each segment's mean z-normalizes
    * against the type's global moments, and the z maps to a 4-letter
    * alphabet through the standard-normal quartile breakpoints
    * (±0.6744897501960817, 0). Reading the symbols in segment order
    * IS the SAX word; the gate keeps segment grain so every PAA mean
    * and breakpoint decision is hash-checked, not just the final
    * string. Constant series (std = 0) drop — no symbols without
    * variance. Determinism: exact integer/decimal moment sums; the
    * z chain is one fixed-shape double expression; breakpoints are
    * identical literals on both engines; segment ids come from
    * integer arithmetic over a per-type row_number (one bounded
    * per-type sort over the reduced hourly frame). */
  def saxSegments(events: DataFrame, w: Int = 12): DataFrame = {
    require(w >= 1, s"w must be >= 1, got $w")
    val hourly = hourlyTypeCounts(events)
    val moments = hourly.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_hours"),
        sum(col("c")).cast("double").as("s1"),
        sum(col("c") * col("c")).cast("double").as("s2"))
      .select(col("event_type"), col("n_hours"),
        (col("s1") / col("n_hours")).as("mean"),
        sqrt(col("s2") / col("n_hours")
          - (col("s1") / col("n_hours")) * (col("s1") / col("n_hours"))).as("std"))
      .filter(col("std") > 0)
    val bp = 0.6744897501960817
    hourly
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("hour"))))
      .join(moments, "event_type")
      .withColumn("seg", expr(s"((rn - 1) * $w) div n_hours"))
      .groupBy(col("event_type"), col("seg"))
      .agg(
        count(lit(1)).as("n_in_seg"),
        sum(col("c")).cast("double").as("ssum"),
        max(col("mean")).as("mean"),
        max(col("std")).as("std"))
      .withColumn("z_paa",
        (col("ssum") / col("n_in_seg") - col("mean")) / col("std"))
      .withColumn("symbol",
        when(col("z_paa") < -bp, "a")
          .when(col("z_paa") < 0.0, "b")
          .when(col("z_paa") < bp, "c")
          .otherwise("d"))
      .select(col("event_type"), col("seg"), col("n_in_seg"),
        col("z_paa"), col("symbol"))
  }

  /** FIRST-CONVERSION LAG profile per acquisition day — the
    * time-to-convert read between funnel counts (events_funnel says
    * HOW MANY convert; this says HOW FAST): per user, the first
    * click and the first purchase inside the ATTRIBUTION WINDOW
    * [click, click + windowUs] (24h default — an unbounded "ever
    * converts" reads ~100% on any long-retention corpus and tells a
    * dashboard nothing; the bound is also what keeps the join
    * time-local at scale); cohort = the first click's day. Scale
    * shape: users reduce to one row each (conditional min), purchases
    * hash-join that reduced frame and reduce again — never an
    * event×event join. Mean lag from the exact decimal µs sum; p50
    * reported in SECONDS at 6dp (the events_iet magnitude lesson — a
    * µs-magnitude R-7 interpolation out-drifts a 6dp round).
    * Unconverted cohort days carry NULL lag columns, never NaN;
    * conv_rate is exact integers in double. */
  def conversionLag(events: DataFrame,
                    windowUs: Long = 86400000000L): DataFrame = {
    val d0 = org.apache.spark.sql.types.DecimalType(28, 0)
    val s = Series.samples(events)
    val fc = s.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("click_us"))
    val fp = s.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"))
      .join(fc, "user_id")
      .filter(col("ts_us") >= col("click_us") &&
        col("ts_us") <= col("click_us") + windowUs)
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("purchase_us"))
    fc.join(fp, Seq("user_id"), "left")
      .withColumn("lag_us", col("purchase_us") - col("click_us"))
      .groupBy(expr("click_us div 86400000000").as("day"))
      .agg(
        count(lit(1)).as("n_clickers"),
        count(col("purchase_us")).as("n_converted"),
        (sum(col("lag_us").cast(d0)).cast("double") / count(col("purchase_us")))
          .as("mean_lag_us"),
        round(expr("percentile(lag_us, 0.5)") / 1000000.0, 6).as("p50_lag_s"))
      .withColumn("conv_rate",
        col("n_converted").cast("double") / col("n_clickers"))
  }

  /** APDEX score per (event_type, day) — the industry-standard
    * user-satisfaction rollup over a latency-like value column
    * (Apdex alliance spec): satisfied ≤ T, tolerating ≤ 4T,
    * frustrated above, score = (satisfied + tolerating/2) / total.
    * Computed as the integer form (2·sat + tol) / (2·total) — exact
    * LONG counts from ONE conditional hash aggregation (map-side
    * partials), a single double division per output row (§4, no
    * rounding needed). T defaults to 50 against this corpus's value
    * distribution (median ~35, p90 ~115) so all three bands populate
    * at every SF — the vacuous-match discipline. */
  def apdex(events: DataFrame, t: Double = 50.0): DataFrame =
    Series.samples(events)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("value") <= t, 1L).otherwise(0L)).as("n_satisfied"),
        sum(when(col("value") > t && col("value") <= 4 * t, 1L).otherwise(0L))
          .as("n_tolerating"),
        sum(when(col("value") > 4 * t, 1L).otherwise(0L)).as("n_frustrated"))
      .withColumn("apdex",
        (lit(2L) * col("n_satisfied") + col("n_tolerating")).cast("double")
          / (lit(2L) * col("n_total")).cast("double"))

  /** MULTIWINDOW SLO BURN RATE (Google SRE workbook ch.5 — the alert
    * shape that replaced naive threshold alerts in production SLO
    * practice): per hour, the fleet error-event fraction over the
    * 1h and trailing-6h windows, each divided by the error BUDGET
    * (1 − SLO target); the alert fires only when BOTH windows burn
    * above `threshold` — the fast window catches the spike, the slow
    * window suppresses the blip. Scale shape: one corpus-reducing
    * conditional hourly aggregation; the 6h sums are ONE range window
    * over the reduced hourly frame — unpartitioned but design-bounded
    * (rows = retention hours: ~9k/decade, never corpus-sized), and
    * RANGE (not ROWS) so empty hours can't silently stretch the
    * window. Integer counts end to end; burns are fixed-shape double
    * division chains; firing is an integer flag. budget=0.2 /
    * threshold=1.2 sit against this corpus's hourly error-rate IQR
    * (0.125–0.27) so both flag branches populate. */
  def burnRate(events: DataFrame, budget: Double = 0.2,
               threshold: Double = 1.2): DataFrame = {
    val hourly = Series.samples(events)
      .groupBy(expr("ts_us div 3600000000").as("hour"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
    val w6 = Window.orderBy(col("hour")).rangeBetween(-5, 0)
    hourly
      .withColumn("tot_6h", sum(col("n_total")).over(w6))
      .withColumn("err_6h", sum(col("n_err")).over(w6))
      .withColumn("burn_1h",
        col("n_err").cast("double") / col("n_total") / budget)
      .withColumn("burn_6h",
        col("err_6h").cast("double") / col("tot_6h") / budget)
      .withColumn("firing",
        when(col("burn_1h") > threshold && col("burn_6h") > threshold, 1L)
          .otherwise(0L))
  }

  /** GENERALIZED-ESD outlier sweep on the per-type hourly counts
    * (Rosner, Technometrics 1983 — the iterative test behind
    * Twitter's S-H-ESD anomaly detector; masking-aware where a
    * single z pass is not: a big outlier inflates the std and HIDES
    * the second one, so each round re-estimates moments WITHOUT the
    * points already removed). k rounds; round i reports the most
    * extreme remaining point's R = |c − mean|/std and flags it
    * against a fixed 3.5σ cut (the normal-approximation variant —
    * Rosner's exact λ_i needs a t-quantile neither engine computes
    * deterministically; documented, not hidden — and 3.5 sits inside
    * the gate corpus's R range 3.19–4.55 so BOTH flag branches
    * populate, the vacuous-branch discipline). Determinism: exact
    * decimal moments over the REMAINING rows each round, one
    * fixed-shape double per R, argmax ordered by the identical
    * computed double with an hour tiebreak. Scale: k passes over the
    * reduced hourly frame — the corpus-scale work is the one hourly
    * aggregation before it. */
  def esdOutliers(events: DataFrame, k: Int = 3, crit: Double = 3.5): DataFrame = {
    require(k >= 1 && k <= 10, s"k in [1, 10], got $k")
    // persist the reduced hourly frame (hours × types rows): every
    // round's moment re-estimate AND the growing anti-join chain embed
    // it as a subtree, so without the cache round i re-ran the corpus-
    // scale hourly aggregation i times (r12 optimization; the unpaired
    // persist is the dedup-family idiom — session-shared, family-
    // cleared by Bench)
    val hourly = hourlyTypeCounts(events).persist()
    var rem = hourly
    var out: DataFrame = null
    for (i <- 1 to k) {
      val st = rem.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).cast("double").as("s1"),
          sum(col("c") * col("c")).cast("double").as("s2"))
        .select(col("event_type"),
          (col("s1") / col("n")).as("mean"),
          sqrt(col("s2") / col("n")
            - (col("s1") / col("n")) * (col("s1") / col("n"))).as("std"))
        .filter(col("std") > 0)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(abs(col("c").cast("double") - col("mean")).desc, col("hour").asc)
      val cand = rem.join(broadcast(st), "event_type")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), lit(i.toLong).as("iter"),
          col("hour").cast("long").as("hour"), col("c").cast("long").as("value"),
          (abs(col("c").cast("double") - col("mean")) / col("std")).as("r_stat"))
        // one row per type per round; read by out AND rem. DELIBERATE
        // unpaired persist, like `hourly` above: the returned frame is
        // lazy, so there is no in-operator unpersist point, and the
        // cached entries are call-specific lineages that accumulate
        // across repeated calls over DIFFERENT inputs in a resident
        // session (ADVICE r12 — documented trade). Bounded smallness:
        // ≤ k rows per type per call plus one hours×types frame; the
        // Bench clears them at each family boundary.
        .persist()
      out = if (out == null) cand else out.unionByName(cand)
      rem = rem.join(cand.select(col("event_type"), col("hour")),
        Seq("event_type", "hour"), "left_anti")
    }
    out.withColumn("anomalous", when(col("r_stat") > crit, 1L).otherwise(0L))
  }

  /** KAPLAN–MEIER survival over user lifetimes with right-censoring
    * (Kaplan & Meier, JASA 1958 — the retention curve done honestly:
    * a user still active near the corpus end hasn't churned, they're
    * CENSORED, and counting them as deaths biases every retention
    * number down): lifetime = (last − first) event time in days;
    * censored when the last event falls within `censorUs` of the
    * corpus horizon. Per lifetime day t with observed deaths:
    * n_risk = users with L ≥ t, and the survival curve reported as
    * −ln S(t) = Σ_{s≤t} −ln(1 − d_s/n_s) — kept in LOG space so the
    * cumulative is an EXACT decimal sum of 9dp-rounded terms (the
    * driftPsi ln discipline) with no cross-engine exp at all; a
    * dashboard exponentiates client-side. All-die days (d = n) carry
    * NULL (S hits 0, −ln S undefined — honest, never Inf). Scale:
    * one user-reducing pass, then everything runs on the ≤max-
    * lifetime-days frame. */
  def survivalKm(events: DataFrame,
                 censorUs: Long = 86400000000L): DataFrame = {
    val dec9 = org.apache.spark.sql.types.DecimalType(28, 9)
    val s = Series.samples(events)
    val per = s.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
    val horizon = s.agg(max(col("ts_us")).as("max_us"))
    val lt = per.crossJoin(broadcast(horizon))
      .select(
        expr("(last_us - first_us) div 86400000000").as("lifetime_d"),
        when(col("last_us") >= col("max_us") - censorUs, 1L).otherwise(0L)
          .as("censored"))
    val hist = lt.groupBy(col("lifetime_d"))
      .agg(
        sum(lit(1L) - col("censored")).as("d"),
        sum(col("censored")).as("c"))
    val byDay = Window.orderBy(col("lifetime_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = lt.count()
    hist
      .withColumn("gone", sum(col("d") + col("c")).over(byDay))
      .withColumn("n_risk", lit(total) - col("gone") + col("d") + col("c"))
      .withColumn("term",
        when(col("d") < col("n_risk"),
          round(-log(lit(1.0) - col("d").cast("double") / col("n_risk")), 9)
            .cast(dec9)))
      // the cumulative skips the NULL guard term on both engines, so
      // mark the all-die row NULL explicitly rather than silently
      // carrying the prior cumulative
      .withColumn("neg_ln_s",
        when(col("term").isNotNull, sum(col("term")).over(byDay).cast("double")))
      .filter(col("d") > 0)
      .select(col("lifetime_d"), col("n_risk"), col("d").as("n_deaths"),
        col("c").as("n_censored"), col("neg_ln_s"))
  }

  /** WELCH'S two-sample t-test on per-user value totals, variants by
    * user-id parity (the [[abCuped]] assignment) — the plain
    * significance readout next to CUPED's variance-reduced one: the
    * unequal-variance t statistic and its Welch–Satterthwaite df,
    * plus the |t| > 1.96 flag (the 5% two-sided normal cut — at the
    * df this corpus produces, t and normal quantiles agree to well
    * under the decision margin). At a billion users this is two hash
    * aggregations and a one-row readout. Determinism: per-user
    * metrics and the per-variant moments are exact DECIMAL sums; the
    * statistics compute in ONE fixed IEEE shape from those moments
    * (variance as (s2 − s1·s1/n)/(n−1), se² terms reused by value);
    * the flag never fires on the parity split of symmetric synthetic
    * data — the honest null result; DETECTION is spec-pinned on a
    * constructed shift. */
  def abWelch(events: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val per = Series.samples(events)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast(d2)).as("m"))
    val mom = per
      .groupBy(pmod(col("user_id"), lit(2L)).as("variant"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s1"),
        sum(col("m") * col("m")).as("s2"))
    def side(v: Int, c: String) =
      max(when(col("variant") === v, col(c))).as(s"$c$v")
    mom.agg(side(0, "n"), side(0, "s1"), side(0, "s2"),
        side(1, "n"), side(1, "s1"), side(1, "s2"))
      .select(col("n0"), col("n1"),
        (col("s10").cast("double") / col("n0")).as("mean_0"),
        (col("s11").cast("double") / col("n1")).as("mean_1"),
        ((col("s20").cast("double") - col("s10").cast("double")
          * col("s10").cast("double") / col("n0")) / (col("n0") - 1)).as("v0"),
        ((col("s21").cast("double") - col("s11").cast("double")
          * col("s11").cast("double") / col("n1")) / (col("n1") - 1)).as("v1"))
      .withColumn("se0", col("v0") / col("n0"))
      .withColumn("se1", col("v1") / col("n1"))
      .withColumn("diff", col("mean_0") - col("mean_1"))
      .withColumn("t_stat", col("diff") / sqrt(col("se0") + col("se1")))
      .withColumn("df",
        (col("se0") + col("se1")) * (col("se0") + col("se1"))
          / (col("se0") * col("se0") / (col("n0") - 1)
            + col("se1") * col("se1") / (col("n1") - 1)))
      .withColumn("significant",
        when(abs(col("t_stat")) > 1.96, 1L).otherwise(0L))
      .select(col("n0"), col("n1"), col("mean_0"), col("mean_1"),
        col("diff"), col("t_stat"), col("df"), col("significant"))
  }

  /** SLO ERROR-BUDGET tracking (the companion read to [[burnRate]] —
    * burn says how fast you're spending; this says how much is LEFT):
    * per hour, the cumulative error fraction from the window start
    * against the budget, consumed = cum_err / cum_tot / budget,
    * remaining = 1 − consumed (negative once blown — the honest
    * answer, never clamped). One corpus-reducing hourly aggregation,
    * then two running sums over the reduced frame (unpartitioned but
    * design-bounded — retention hours, the [[burnRate]] argument).
    * Integer counts, one fixed-shape double chain, integer exhausted
    * flag. */
  def errorBudget(events: DataFrame, budget: Double = 0.2): DataFrame = {
    val hourly = Series.samples(events)
      .groupBy(expr("ts_us div 3600000000").as("hour"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
    val w = Window.orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourly
      .withColumn("cum_tot", sum(col("n_total")).over(w))
      .withColumn("cum_err", sum(col("n_err")).over(w))
      .withColumn("consumed",
        col("cum_err").cast("double") / col("cum_tot") / budget)
      .withColumn("remaining", lit(1.0) - col("consumed"))
      .withColumn("exhausted",
        when(col("consumed") > 1.0, 1L).otherwise(0L))
      .select(col("hour"), col("cum_tot"), col("cum_err"),
        col("consumed"), col("remaining"), col("exhausted"))
  }

  /** CUSUM change-point detection (Page 1954) — the sequential
    * mean-shift detector: per series, the one-sided cumulative sums
    *   s_i = max(0, s_{i-1} ± z_i − k)   (z = standardized value)
    * fire a change point when they cross the decision threshold `h`
    * upward. The recursion never runs as a loop: with prefix sums
    * c_i = Σ(d_j) the identity  s_i = c_i − min(0, min_{j≤i} c_j)
    * turns both CUSUM sides into TWO window functions over ONE
    * (series, time) sort — running sum + running min — and the
    * crossing test is a lag over the same sort. Exchange-wise the
    * corpus shuffles once for the window; the per-series moments
    * come from the same exact-decimal one-pass aggregation the
    * zscore operator uses and broadcast back.
    *
    * Determinism: the summand rounds to 6dp DECIMAL before the
    * running sum, so the prefix sums are EXACT whatever the window
    * engine's accumulation order (DuckDB evaluates window sums
    * through a segment tree — a double summand would hash-drift);
    * the threshold compare happens in decimal too. */
  def cusum(samples: DataFrame, k: Double = 0.25, h: Double = 3.0): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val hDec = lit(h).cast(dec)
    val zero = lit(0).cast(dec)
    val moments = samples.groupBy(col("series_id"))
      .agg(count(lit(1)).as("n"),
        exactSum(col("value"), 6).as("s1"),
        exactSum(col("value") * col("value"), 6).as("s2"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("std", sqrt(col("s2") / col("n") - col("mean") * col("mean")))
      .filter(col("std") > 0)
      .select("series_id", "mean", "std")
    val w = Window.partitionBy(col("series_id")).orderBy(col("ts_us"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    samples
      .join(broadcast(moments), "series_id")
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .withColumn("d_hi", round(col("z") - k, 6).cast(dec))
      .withColumn("d_lo", round(-col("z") - k, 6).cast(dec))
      .withColumn("c_hi", sum(col("d_hi")).over(run))
      .withColumn("c_lo", sum(col("d_lo")).over(run))
      .withColumn("s_hi", col("c_hi") - least(zero, min(col("c_hi")).over(run)))
      .withColumn("s_lo", col("c_lo") - least(zero, min(col("c_lo")).over(run)))
      .withColumn("p_hi", lag(col("s_hi"), 1).over(w))
      .withColumn("p_lo", lag(col("s_lo"), 1).over(w))
      .withColumn("up",
        col("s_hi") >= hDec && (col("p_hi").isNull || col("p_hi") < hDec))
      .withColumn("down",
        col("s_lo") >= hDec && (col("p_lo").isNull || col("p_lo") < hDec))
      .filter(col("up") || col("down"))
      .select(col("series_id"), col("ts_us"), col("value"),
        when(col("up"), "up").otherwise("down").as("direction"),
        // the stat is an exact 6dp decimal; round() after the double
        // cast pins both engines to the correctly-rounded double
        // (DuckDB's raw decimal→double cast multiplies by 1e-6 and
        // lands 1 ulp high — no tie risk, the 7th decimal is zero)
        round(when(col("up"), col("s_hi")).otherwise(col("s_lo"))
          .cast("double"), 6).as("stat"))
  }

  /** Revenue CONCENTRATION per event type — Gini coefficient over
    * per-user value totals (the rank-sum identity G = 2·Σi·x_i/(n·Σx)
    * − (n+1)/n on ascending ranks) plus the top-decile share: the
    * whale-dependence read every marketplace/monetization review
    * opens with. One pass to per-user exact-decimal totals, one
    * rank window PARTITIONED BY TYPE (never global), aggregates on
    * exact products (rank × 2dp decimal) so the statistic is
    * bit-stable; the final Gini expression is one shared IEEE shape.
    * Ties rank deterministically by user id. */
  def revenueGini(events: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
    val perUser = Series.samples(events)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("value").cast(d2)).as("rev"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("rev"), col("user_id"))
    val ranked = perUser.withColumn("rnk", row_number().over(w))
      .withColumn("nu",
        count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .withColumn("is_top", col("rnk") > floor(col("nu") * 0.9))
    ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("rev")).cast("double").as("total_value"),
        sum(col("rnk") * col("rev")).cast("double").as("s1"),
        sum(when(col("is_top"), col("rev")).otherwise(lit(0).cast(d2)))
          .cast("double").as("top_decile_value"))
      .select(col("event_type"), col("n_users"), col("total_value"),
        ((lit(2.0) * col("s1")) / (col("n_users") * col("total_value"))
          - (col("n_users") + lit(1.0)) / col("n_users")).as("gini"),
        (col("top_decile_value") / col("total_value")).as("top_decile_share"))
  }

  /** LINEAR MULTI-TOUCH attribution — [[attribution]]'s last-touch
    * rule gives the whole purchase to one click; the linear model
    * splits each purchase's value EQUALLY across every click in its
    * preceding window, the standard fairness baseline marketing
    * stacks report next to last-touch. Pairs come from the chunked
    * range join (never a cross product: a click meets only the
    * purchases whose window overlaps its time chunk), the per-purchase
    * touch count is one aggregation, and the SPLIT IS INTEGER: value
    * → exact cents → micro-cent credit by integer division (value/n
    * as a rounded decimal would land on the §4 seven-decimal-tie
    * class at touch counts like 32 — 2dp/2^5 is an exactly-7dp
    * quantity). Credits re-sum exactly under any order; the ≤n
    * micro-cent floor remainder per purchase is the documented loss.
    * Output per day: purchases touched, touches, credited value —
    * plus the untouched remainder so credited + organic ≈ total
    * purchase value (conservation, spec-pinned). */
  def attributionLinear(events: DataFrame, windowUs: Long = 3600000000L): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
    val sm = Series.samples(events)
    val purchases = sm.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts_us").as("p_ts"), col("value"),
        (col("ts_us") - windowUs).as("start_us"), col("ts_us").as("end_us"))
    val clicks = sm.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"))
    val touches = RangeJoin.pointsInIntervals(clicks, purchases, Seq("user_id"))
      .groupBy(col("p_id"), col("p_ts"), col("value"))
      .agg(count(lit(1)).as("n_touches"))
      .withColumn("cents", round(col("value") * 100.0, 0).cast("long"))
      .withColumn("credit_ucents", expr("(cents * 1000000) div n_touches"))
    val touched = touches
      .groupBy(expr("p_ts div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_purchases_touched"),
        sum(col("n_touches")).as("n_touches"),
        (sum(col("credit_ucents") * col("n_touches")).cast("double")
          / lit(1e8)).as("credited_value"))
    val organic = purchases
      .join(touches.select(col("p_id")), Seq("p_id"), "left_anti")
      .groupBy(expr("p_ts div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_purchases_organic"),
        sum(col("value").cast(d2)).cast("double").as("organic_value"))
    touched.join(organic, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_purchases_touched"), lit(0L)).as("n_purchases_touched"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("credited_value"), lit(0.0)).as("credited_value"),
        coalesce(col("n_purchases_organic"), lit(0L)).as("n_purchases_organic"),
        coalesce(col("organic_value"), lit(0.0)).as("organic_value"))
  }

  /** SEASONAL-NAIVE forecast backtest — the baseline every fancier
    * model must beat (forecasting 101: report the model's error NEXT
    * TO the naive baseline's, or the model's error means nothing):
    * ŷ(h) = y(h − `seasonBuckets`), scored on every bucket with a
    * season-old sibling. Read beside [[forecastBacktest]]'s linear
    * model: per series, whichever MAE is lower is the model to serve
    * (a seasonal corpus beats the line; a trending one doesn't).
    * Same hourly bucket frame and error discipline as the linear
    * backtest (exact 2dp bucket sums; |err| and err² round to 6dp
    * decimals before the order-free sums); the lag resolves as a
    * self-join on (series, h − season) — an equi-join, no window
    * sort. */
  def seasonalNaiveBacktest(samples: DataFrame, bucketUs: Long = 3600000000L,
                            seasonBuckets: Int = 24): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val d6 = org.apache.spark.sql.types.DecimalType(18, 6)
    val b = samples
      .groupBy(col("series_id"), expr(s"ts_us div $bucketUs").as("h"))
      .agg(sum(col("value").cast(d2)).cast(d2).as("y"))
      // actual side + season-lag side of the equi-join both embed this
      // corpus-scale bucket reduction — persist so it runs once (r13;
      // §5, the forecastBacktest bucket-frame idiom; series×hours rows)
      .persist()
    val lag = b.select(col("series_id"),
      (col("h") + seasonBuckets).as("h"), col("y").as("y_hat"))
    b.join(lag, Seq("series_id", "h"))
      .withColumn("err", (col("y") - col("y_hat")).cast("double"))
      .groupBy(col("series_id"))
      .agg(count(lit(1)).as("n_scored"),
        sum(round(abs(col("err")), 6).cast(d6)).cast("double").as("sae"),
        sum(round(col("err") * col("err"), 6).cast(d6)).cast("double").as("see"))
      .select(col("series_id"), col("n_scored"),
        (col("sae") / col("n_scored")).as("mae"),
        sqrt(col("see") / col("n_scored")).as("rmse"))
  }

  /** WINDOWED FUNNEL depth histogram (the ClickHouse `windowFunnel`
    * read, strict-order mode): for every user, the deepest
    * view → click → purchase chain that fits ENTIRELY inside
    * `windowUs` of the chain's own first step — unlike [[funnel3]],
    * which anchors on the user's FIRST view and windows each step,
    * every view is a candidate anchor here and the window binds the
    * WHOLE chain (the "did the journey complete within a day"
    * question). Chain semantics are greedy-from-anchor (first click
    * at-or-after the view, first purchase at-or-after that click,
    * both within anchor+window) — explicit, restatable, and the
    * standard windowFunnel behavior. Output: (funnel_depth, n_users),
    * depth 0 = users with events but no view.
    *
    * Scale shape: both step resolutions ride the chunked
    * point-in-interval join keyed on user (never a theta join); the
    * per-view min-aggregations collapse candidates back to anchor
    * grain before the next step; the histogram is a two-level hash
    * aggregation. */
  def windowFunnel(events: DataFrame,
                   windowUs: Long = 24L * 3600L * 1000000L): DataFrame = {
    val sm = Series.samples(events)
    val views = sm.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("v_ts"),
        col("ts_us").as("start_us"), (col("ts_us") + windowUs).as("end_us"))
    val clicks = sm.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"))
    val purchases = sm.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"))
    // chunk grain = the window: the default 1h chunks would explode
    // every 24h interval into 25 join copies (measured 10.2× wall at
    // 100× data; window-sized chunks cut it to ≤2 copies and the
    // same-user candidate filter absorbs the coarser buckets — 3.9×)
    val chunk = windowUs
    // step 2: first click in [v, v+W] per anchor view
    val s2 = RangeJoin.pointsInIntervals(clicks, views, Seq("user_id"),
        chunkUs = chunk)
      .groupBy(col("user_id"), col("v_ts"), col("end_us"))
      .agg(min(col("ts_us")).as("c_ts"))
    // step 3: first purchase in [c, v+W] per converted anchor
    val s3 = RangeJoin.pointsInIntervals(purchases,
        s2.select(col("user_id"), col("v_ts"),
          col("c_ts").as("start_us"), col("end_us")), Seq("user_id"),
        chunkUs = chunk)
      .groupBy(col("user_id"), col("v_ts"))
      .agg(min(col("ts_us")).as("p_ts"))
    val perView = views.select(col("user_id"), col("v_ts"))
      .join(s2.select(col("user_id"), col("v_ts"), col("c_ts")),
        Seq("user_id", "v_ts"), "left")
      .join(s3, Seq("user_id", "v_ts"), "left")
      .select(col("user_id"),
        (lit(1L) + col("c_ts").isNotNull.cast("long")
          + col("p_ts").isNotNull.cast("long")).as("depth"))
    val perUser = sm.select(col("user_id")).distinct()
      .join(perView.groupBy(col("user_id")).agg(max(col("depth")).as("d")),
        Seq("user_id"), "left")
      .select(coalesce(col("d"), lit(0L)).as("funnel_depth"))
    perUser.groupBy(col("funnel_depth"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** TIME-DECAY multi-touch attribution — the third standard model
    * next to last-touch ([[attribution]]) and equal-split
    * ([[attributionLinear]]): a touch's credit halves per `halfLifeUs`
    * of age at purchase time. The decay is STEP decay in exact binary
    * fractions — weight = 2^(KB − age div halfLife) with
    * KB = window div halfLife — so weights are small INTEGERS and the
    * whole model stays in the integer micro-cent discipline
    * (credit = (cents·10^6·w) div Σw): no libm pow, no cross-engine
    * drift, restatable exactly. Same plan shape as linear: the
    * chunked point-in-interval join, one per-purchase aggregation,
    * one join back for per-touch credits, a daily rollup. */
  def attributionDecay(events: DataFrame, windowUs: Long = 3600000000L,
                       halfLifeUs: Long = 900000000L): DataFrame = {
    require(windowUs > 0 && halfLifeUs > 0 && windowUs / halfLifeUs <= 40,
      "window div halfLife must stay <= 40 (weights are 1L << k)")
    val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
    val kb = windowUs / halfLifeUs
    val sm = Series.samples(events)
    val purchases = sm.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts_us").as("p_ts"), col("value"),
        (col("ts_us") - windowUs).as("start_us"), col("ts_us").as("end_us"))
    val clicks = sm.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"))
    val touches = RangeJoin.pointsInIntervals(clicks, purchases, Seq("user_id"))
      .withColumn("w", expr(
        s"shiftleft(1L, cast($kb - (p_ts - ts_us) div ${halfLifeUs}L as int))"))
    val per = touches.groupBy(col("p_id"))
      .agg(count(lit(1)).as("n_touches"), sum(col("w")).as("sw"))
    val credits = touches.join(per, "p_id")
      .withColumn("cents", round(col("value") * 100.0, 0).cast("long"))
      .withColumn("credit_ucents", expr("(cents * 1000000 * w) div sw"))
    val touched = credits
      .groupBy(expr("p_ts div 86400000000").as("day"))
      .agg(count_distinct(col("p_id")).as("n_purchases_touched"),
        count(lit(1)).as("n_touches"),
        (sum(col("credit_ucents")).cast("double") / lit(1e8)).as("credited_value"))
    val organic = purchases
      .join(per.select(col("p_id")), Seq("p_id"), "left_anti")
      .groupBy(expr("p_ts div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_purchases_organic"),
        sum(col("value").cast(d2)).cast("double").as("organic_value"))
    touched.join(organic, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_purchases_touched"), lit(0L)).as("n_purchases_touched"),
        coalesce(col("n_touches"), lit(0L)).as("n_touches"),
        coalesce(col("credited_value"), lit(0.0)).as("credited_value"),
        coalesce(col("n_purchases_organic"), lit(0L)).as("n_purchases_organic"),
        coalesce(col("organic_value"), lit(0.0)).as("organic_value"))
  }

  /** ASSOCIATION LIFT between event-type pairs at USER grain — the
    * market-basket read ("users who do A also do B?") behind
    * cross-sell and surface-affinity analysis: for every unordered
    * type pair, support = P(both), confidence = P(b|a), and
    * lift = P(ab)/(P(a)·P(b)) (>1 = the behaviors attract, <1 = they
    * repel). Scale shape: the corpus collapses FIRST to the distinct
    * (user, type) incidence (map-side partial distinct) — the
    * user-keyed self-join then fans out at most types²/2 rows per
    * user, bounded by the type vocabulary, never by event volume; the
    * type marginals and the user count are one aggregation each. All
    * counts exact integers; the three ratios are fixed-shape IEEE
    * divisions (§4). */
  def liftMatrix(events: DataFrame): DataFrame = {
    val ut = Series.samples(events)
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = broadcast(ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users")))
    val tc = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id")
        && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(tc.select(col("event_type").as("type_a"), col("n").as("n_a")), "type_a")
      .join(tc.select(col("event_type").as("type_b"), col("n").as("n_b")), "type_b")
      .crossJoin(nUsers)
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"), col("n_users"),
        (col("n_both").cast("double") / col("n_users").cast("double")).as("support"),
        (col("n_both").cast("double") / col("n_a").cast("double")).as("confidence"),
        (col("n_both").cast("double") * col("n_users").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** INTERVAL-UNION coverage per user — each event opens a half-open
    * activity interval [ts, ts + holdUs); overlapping intervals merge
    * into islands and the report is the union's measure: how long was
    * the user ACTUALLY active, how fragmented, what share of their
    * span. The classic gaps-and-islands merge (a new island starts
    * where an interval begins at-or-after the running max end of
    * everything before it) — [[sessionize]]'s gap rule can't express
    * it because intervals have WIDTH: a long interval can swallow
    * several later starts. Two windows + one aggregation over a
    * single (user, time) sort; all-integer until the final coverage
    * ratio. */
  def activeTime(events: DataFrame, holdUs: Long = 300000000L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Series.samples(events)
      .select(col("user_id"), col("ts_us"), col("event_id"),
        (col("ts_us") + holdUs).as("end_us"))
      .withColumn("prev_max_end",
        max(col("end_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        when(col("prev_max_end").isNull || col("ts_us") >= col("prev_max_end"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n"), min(col("ts_us")).as("s"), max(col("end_us")).as("e"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("n")).as("n_events"),
        count(lit(1)).as("n_islands"),
        sum(col("e") - col("s")).as("covered_us"),
        (max(col("e")) - min(col("s"))).as("span_us"))
      .select(col("user_id"), col("n_events"), col("n_islands"),
        col("covered_us"), col("span_us"),
        (col("covered_us").cast("double") / col("span_us").cast("double"))
          .as("coverage_frac"))
  }

  /** Gap-based sessionization over the raw event stream: a session
    * breaks after `gapUs` of inactivity per user. Two windows over the
    * same (user_id × time) sort — Catalyst reuses one shuffle+sort. */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Series.samples(events)
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        exactSum(col("value"), 2).as("sum_value"))
  }

  /** BOUNCE RATE per day — the single-event-session fraction, the
    * engagement headline every product dashboard leads with (and the
    * first casualty of a broken tracking deploy: bounces spike the
    * hour the second-event beacon stops firing). Rides [[sessionize]]
    * verbatim (same gap, same windows), a session's day = its START
    * day; bounce = exactly one event. Exact integer division in
    * double. Output: (day, n_sessions, n_bounces, bounce_rate). */
  def bounceRate(events: DataFrame, gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame =
    sessionize(events, gapUs)
      .groupBy(expr("start_us div 86400000000").as("day"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .withColumn("bounce_rate",
        col("n_bounces").cast("double") / col("n_sessions"))

  /** Lagged CROSS-correlation between series PAIRS — the lead/lag
    * detector [[acf]] cannot answer (acf asks "does a series predict
    * itself?"; this asks "does series A lead series B by k hours?" —
    * the root-cause read when an error-rate series spikes after a
    * deploy-event series). Per unordered type pair (a < b, one row
    * per pair per lag, r_ab(−k) = r_ba(k) so signed lags on the
    * ordered pair carry the full picture): Pearson r between a's
    * hourly count at h and b's at h+lag.
    *
    * Determinism (§4): the six moments are EXACT decimal sums of
    * integer counts cast to double once, and r is the single
    * fixed-shape expression (n·Σxy−ΣxΣy)/√(vx·vy) both engines
    * evaluate on identical operands. Scale: the join and aggregation
    * run on the reduced n_types × n_hours frame — the corpus-scale
    * work is the one hourly aggregation feeding it. */
  def crossCorr(events: DataFrame, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 24, s"maxLag in [1, 24], got $maxLag")
    val hourly = hourlyTypeCounts(events)
    val withLag = hourly.select(col("event_type"), col("hour"), col("c"),
      explode(expr(s"sequence(${-maxLag}, $maxLag)")).as("lag"))
    val pairs = withLag.alias("a").join(hourly.alias("b"),
        col("a.event_type") < col("b.event_type") &&
          col("b.hour") === col("a.hour") + col("a.lag"))
      .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.lag").as("lag"), col("a.c").as("x"), col("b.c").as("y"))
    pairs.groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .withColumn("vx", col("n_pairs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n_pairs") * col("syy") - col("sy") * col("sy"))
      .select(col("type_a"), col("type_b"), col("lag"), col("n_pairs"),
        when(col("vx") > 0 && col("vy") > 0,
          (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            / sqrt(col("vx") * col("vy"))).as("xcorr"))
  }

  /** TUKEY-fence outliers on the hourly counts — the boxplot rule
    * (Tukey, EDA 1977), the quartile-based sibling of the moment
    * detectors ([[esdOutliers]] z, mad, band): fences at
    * Q1 − k·IQR / Q3 + k·IQR flag without letting the outlier itself
    * inflate the yardstick (quartiles barely move when the tail
    * does — the robustness z lacks at small n). Determinism (§4):
    * quartiles are the R-7 interpolation both engines implement
    * (Spark `percentile` = DuckDB `quantile_cont`) rounded to 6dp —
    * a TOLERANCE for last-ULP libm drift, the ts_quantiles rule —
    * and fences derive from the rounded values, so the flag
    * comparison runs on identical doubles. Scale: quartile state is
    * per-type over its hours; the flag pass joins the broadcast
    * 5-row fence frame. Both branches populate at sf0.1 (error's
    * min 12 < lo 13.5; every type's max clears hi). */
  def iqrOutliers(events: DataFrame, k: Double = 1.5): DataFrame = {
    require(k > 0, s"fence multiplier must be > 0, got $k")
    val hourly = hourlyTypeCounts(events)
    val st = hourly.groupBy(col("event_type"))
      .agg(
        round(expr("percentile(CAST(c AS DOUBLE), 0.25)"), 6).as("q1"),
        round(expr("percentile(CAST(c AS DOUBLE), 0.75)"), 6).as("q3"))
      .withColumn("fence_lo", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("fence_hi", col("q3") + lit(k) * (col("q3") - col("q1")))
    hourly.join(broadcast(st), "event_type")
      .filter(col("c") < col("fence_lo") || col("c") > col("fence_hi"))
      .select(col("event_type"), col("hour").cast("long").as("hour"),
        col("c").cast("long").as("cnt"),
        col("fence_lo"), col("fence_hi"),
        when(col("c") < col("fence_lo"), lit("low")).otherwise(lit("high"))
          .as("side"))
  }

  /** WESTERN ELECTRIC run rules (the 1956 SQC handbook tests 1–4) —
    * the control-chart discipline a plain 3σ alert misses: a process
    * can drift for a SHIFT's worth of hours without one point
    * crossing 3σ, which is exactly what rules 2–4 (zone runs) catch.
    * Per type, z against the series' own population moments, then
    * over the OBSERVED hourly sequence (gap hours absent — the rules
    * run on consecutive samples, stated, not hidden):
    *   rule1: |z| > 3 (the classic);
    *   rule2: ≥2 of the last 3 beyond 2σ, same side;
    *   rule3: ≥4 of the last 5 beyond 1σ, same side;
    *   rule4: 8 consecutive on one side of the mean.
    * Output: only firing hours, with per-rule flags. Determinism
    * (§4): moments are exact decimal sums cast once (the esd shape);
    * every zone comparison runs on the identical computed double;
    * the run sums are integer window sums both engines restate with
    * the same ROWS frames. Rule4's sum can only reach 8 with 8 rows
    * present, so no separate window-fill check is needed. Scale:
    * everything past the hourly reduction is per-type bounded
    * windows on the reduced frame. */
  def spcRules(events: DataFrame): DataFrame = {
    val hourly = hourlyTypeCounts(events)
    val st = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).cast("double").as("s1"),
        sum(col("c") * col("c")).cast("double").as("s2"))
      .select(col("event_type"),
        (col("s1") / col("n")).as("mean"),
        sqrt(col("s2") / col("n")
          - (col("s1") / col("n")) * (col("s1") / col("n"))).as("std"))
      .filter(col("std") > 0)
    val z = hourly.join(broadcast(st), "event_type")
      .withColumn("z", (col("c").cast("double") - col("mean")) / col("std"))
    def runSum(c: Column, rows: Int): Column =
      sum(c).over(Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-(rows - 1), 0))
    val flagged = z
      .withColumn("rule1", when(abs(col("z")) > 3, 1L).otherwise(0L))
      .withColumn("rule2",
        when(runSum(when(col("z") > 2, 1L).otherwise(0L), 3) >= 2 ||
             runSum(when(col("z") < -2, 1L).otherwise(0L), 3) >= 2, 1L)
          .otherwise(0L))
      .withColumn("rule3",
        when(runSum(when(col("z") > 1, 1L).otherwise(0L), 5) >= 4 ||
             runSum(when(col("z") < -1, 1L).otherwise(0L), 5) >= 4, 1L)
          .otherwise(0L))
      .withColumn("rule4",
        when(runSum(when(col("z") > 0, 1L).otherwise(0L), 8) === 8 ||
             runSum(when(col("z") < 0, 1L).otherwise(0L), 8) === 8, 1L)
          .otherwise(0L))
    flagged
      .filter(col("rule1") + col("rule2") + col("rule3") + col("rule4") > 0)
      .select(col("event_type"), col("hour").cast("long").as("hour"),
        col("c").cast("long").as("cnt"),
        col("rule1"), col("rule2"), col("rule3"), col("rule4"))
  }

  /** USER-concentration top shares — "what fraction of all events do
    * the top p% of users generate?" (the Lorenz-curve reads behind
    * [[gini]]'s single number: a dashboard quotes top-1/5/10% shares,
    * and abuse review watches the 1% line). Grain: one row per
    * requested percentile.
    *
    * Scale design — NO global rank over users: a row_number across a
    * billion users is the anti-pattern; instead users reduce to an
    * activity HISTOGRAM (one row per distinct per-user event count —
    * bounded by max events/user, thousands at most), the cumulative
    * runs over that tiny frame, and the top-k cut interpolates
    * inside the one straddling tied level:
    * take = clamp(k − users_above_level, 0, level_users). Exact
    * integers end to end (k = ⌈p·n_users/100⌉ in integer arithmetic),
    * ONE raw double division for the share (§4). */
  def userConcentration(events: DataFrame,
                        pcts: Seq[Int] = Seq(1, 5, 10)): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles in [1, 100], got $pcts")
    val spark = events.sparkSession
    import spark.implicits._
    val per = Series.samples(events).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_ev"))
    val hist = per.groupBy(col("n_ev")).agg(count(lit(1)).as("u"))
    val cum = hist.withColumn("cum_u",
      sum(col("u")).over(Window.orderBy(col("n_ev").desc)
        .rowsBetween(Window.unboundedPreceding, 0)))
    val totals = per.agg(count(lit(1)).as("n_users"),
      sum(col("n_ev")).as("n_events"))
    cum.crossJoin(broadcast(totals))
      .crossJoin(broadcast(pcts.map(_.toLong).toDF("pct")))
      .withColumn("k", expr("(pct * n_users + 99) div 100"))
      .withColumn("take",
        greatest(lit(0L), least(col("u"), col("k") - (col("cum_u") - col("u")))))
      .groupBy(col("pct"), col("n_users"), col("n_events"), col("k"))
      .agg(sum(col("take") * col("n_ev")).as("top_events"))
      .select(col("pct"), col("n_users"), col("k").as("k_users"),
        col("top_events"), col("n_events"),
        (col("top_events").cast("double") / col("n_events").cast("double"))
          .as("share"))
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) on per-user value totals —
    * the DISTRIBUTION-FREE sibling of [[abWelch]]: revenue-per-user
    * is heavy-tailed, and a whale landing in one arm moves a t-test
    * where the rank test shrugs (the reason experimentation stacks
    * report both). Same parity assignment as the Welch/CUPED gates.
    *
    * Scale design — NO global rank over users: ranks only enter as
    * the per-variant rank SUM, so totals reduce to a VALUE HISTOGRAM
    * (per distinct total: arm counts), the cumulative runs over that
    * frame, and each tied block contributes its exact average rank
    * cum_before + (t+1)/2 — carried DOUBLED (2·avg_rank =
    * 2·cum_before + t + 1) so the rank sum aggregates as an EXACT
    * integer at any scale and halves once at the end. U, the
    * tie-corrected variance Σ(t³−t), and z are the classic closed
    * forms as fixed-shape expressions on exact operands (§4);
    * |z| > 1.96 flags. Honestly null on the parity split — the
    * detection power is spec-pinned on a constructed shift. */
  def abMannWhitney(events: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val per = Series.samples(events)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast(d2)).as("m"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    val hist = per.groupBy(col("m"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c1"))
      .withColumn("t", col("c0") + col("c1"))
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("t")).over(Window.orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    cum
      .agg(
        sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
        sum(col("c0") * (lit(2L) * col("cum_before") + col("t") + 1))
          .as("r0x2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tie_sum"))
      .withColumn("n", col("n0") + col("n1"))
      .withColumn("u0", col("r0x2") / lit(2.0)
        - col("n0") * (col("n0") + 1) / lit(2.0))
      .withColumn("mu", col("n0") * col("n1") / lit(2.0))
      .withColumn("sigma2",
        col("n0") * col("n1") / lit(12.0)
          * ((col("n") + 1)
            - col("tie_sum").cast("double") / (col("n") * (col("n") - 1))))
      .withColumn("z", (col("u0") - col("mu")) / sqrt(col("sigma2")))
      .withColumn("significant", when(abs(col("z")) > 1.96, 1L).otherwise(0L))
      .select(col("n0"), col("n1"), col("u0"), col("tie_sum"), col("z"),
        col("significant"))
  }

  /** Unnormalized HAAR WAVELET energy spectrum per series — the
    * multi-resolution variance ladder (which TIME SCALE carries the
    * signal's energy: level 1 = hour-to-hour jitter, level 5 =
    * 16h-vs-16h swings — the dial that says whether smoothing or
    * daily seasonality work is worth it, complementing
    * ts_periodogram's fixed-period probe). Over the first `span`
    * hours from `baseUs`: level-l detail d = (left half-block sum) −
    * (right half-block sum) over 2^l-hour blocks, energy_l = Σ d².
    *
    * Determinism (§4): the UNNORMALIZED transform keeps every
    * coefficient an exact INTEGER (the 1/√2 of textbook Haar never
    * appears — a reader rescales by 2^(l/2) client-side); absent
    * hours contribute 0 to their block sum on both engines. Scale:
    * ONE hash aggregation per level over the reduced hourly frame,
    * all levels riding a broadcast 5-row level table. */
  def haarDwt(events: DataFrame, levels: Int = 5, span: Int = 256,
              baseUs: Long = 1704067200000000L): DataFrame = {
    require(levels >= 1 && levels <= 20 && (1 << levels) <= span,
      s"levels=$levels must fit span=$span")
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = Series.samples(events)
      .filter(col("ts_us") >= baseUs &&
        col("ts_us") < baseUs + span * 3600000000L)
      .groupBy(col("event_type"),
        expr(s"(ts_us - $baseUs) div 3600000000").as("idx"))
      .agg(count(lit(1)).as("c"))
    val lvl = (1 to levels).map(l => (l, 1L << (l - 1))).toDF("lvl", "half")
    hourly.crossJoin(broadcast(lvl))
      .groupBy(col("event_type"), col("lvl"),
        expr("idx div (half * 2)").as("block"))
      .agg(sum(when(expr("(idx div half) % 2") === 0,
        col("c")).otherwise(-col("c"))).as("d"))
      .groupBy(col("event_type"), col("lvl"))
      .agg(count(lit(1)).as("n_blocks"), sum(col("d") * col("d")).as("energy"))
  }

  /** HURST EXPONENT via rescaled-range analysis (Hurst 1951; Mandelbrot
    * & Wallis 1969) — the long-memory dial on the hourly count series:
    * H ≈ 0.5 says increments forget (Poisson-ish traffic — capacity
    * math may assume independence), H → 1 says bursts cluster across
    * scales (the regime where "mean + 3σ" provisioning quietly
    * under-buys). Per window size m ∈ {16,32,64}h: complete m-hour
    * blocks, per block R = max−min of the cumulative deviations from
    * the block mean and S = its population σ, mean R/S per size, and
    * H = the log-log slope.
    *
    * Determinism (§4): block moments ride exact decimal sums; per-block
    * R/S rounds to 9dp decimal before the ORDER-FREE mean; and because
    * the sizes are FIXED literals the regression collapses to a
    * closed-form weighted sum — for log-equally-spaced {16,32,64} the
    * slope is exactly (y₆₄ − y₁₆)/(2·ln 2) with 2·ln 2 a driver-side
    * literal shared with the oracle (the periodogram literal pattern;
    * no data-dependent x ever enters). Scale: everything past the
    * hourly reduction runs on blocks-per-type frames; the windows are
    * per-block bounded. */
  def hurst(events: DataFrame,
            baseUs: Long = 1704067200000000L): DataFrame = {
    val d9 = org.apache.spark.sql.types.DecimalType(28, 9)
    val spark = events.sparkSession
    import spark.implicits._
    val hourly = Series.samples(events)
      .filter(col("ts_us") >= baseUs)
      .groupBy(col("event_type"),
        expr(s"(ts_us - $baseUs) div 3600000000").as("idx"))
      .agg(count(lit(1)).cast(org.apache.spark.sql.types.DecimalType(19, 0))
        .as("c"))
    val sz = Seq(16L, 32L, 64L).toDF("m")
    val withSz = hourly.crossJoin(broadcast(sz))
      .withColumn("block", expr("idx div m"))
      .withColumn("pos", expr("idx % m"))
    val blocks = withSz
      .groupBy(col("event_type"), col("m"), col("block"))
      .agg(count(lit(1)).as("nb"),
        sum(col("c")).cast("double").as("s1"),
        sum(col("c") * col("c")).cast("double").as("s2"))
      .filter(col("nb") === col("m"))
      .select(col("event_type"), col("m"), col("block"),
        (col("s1") / col("m")).as("mean"),
        sqrt(col("s2") / col("m")
          - (col("s1") / col("m")) * (col("s1") / col("m"))).as("std"))
      .filter(col("std") > 0)
    val dev = withSz
      .join(blocks, Seq("event_type", "m", "block"))
      .withColumn("cum",
        sum(col("c")).over(Window
          .partitionBy(col("event_type"), col("m"), col("block"))
          .orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dv",
        col("cum").cast("double") - (col("pos") + 1) * col("mean"))
    val rs = dev
      .groupBy(col("event_type"), col("m"), col("block"), col("std"))
      .agg((max(col("dv")) - min(col("dv"))).as("r"))
      .withColumn("rs", col("r") / col("std"))
    val mrs = rs.groupBy(col("event_type"), col("m"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(round(col("rs"), 9).cast(d9)).as("srs"))
      .withColumn("mean_rs", col("srs").cast("double") / col("n_blocks"))
      .withColumn("y", round(log(col("mean_rs")), 9))
    def at(m: Long, c: String) = max(when(col("m") === m, col(c)))
    mrs.groupBy(col("event_type"))
      .agg(at(16, "mean_rs").as("rs16"), at(32, "mean_rs").as("rs32"),
        at(64, "mean_rs").as("rs64"),
        at(16, "y").as("y16"), at(64, "y").as("y64"))
      .withColumn("hurst",
        (col("y64") - col("y16")) / lit(2.0 * math.log(2.0)))
      .select(col("event_type"), col("rs16"), col("rs32"), col("rs64"),
        col("hurst"))
  }

  /** WEEKLY (day-of-week × hour-of-day) traffic profile per type — the
    * weekday/weekend heatmap behind staffing and alert-baseline
    * decisions; ts_seasonal_profile reads only the daily cycle, this
    * adds the week axis. dow follows the PromQL/Unix convention
    * 0 = Sunday via pure integer arithmetic ((epoch_days + 4) % 7 —
    * epoch day 0 was a Thursday); share = cell/total as one raw IEEE
    * division (§4). One hash aggregation; the share window runs on
    * the 168-cells-per-type frame. */
  def weeklyProfile(events: DataFrame): DataFrame =
    Series.samples(events)
      .groupBy(col("event_type"),
        expr("(ts_us div 86400000000 + 4) % 7").as("dow"),
        expr("(ts_us div 3600000000) % 24").as("hour_of_day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double")
          / sum(col("n")).over(Window.partitionBy(col("event_type"))))

  /** DAU/MAU STICKINESS — the daily-habit ratio growth teams quote
    * (1.0 = every monthly active shows up daily; ~0.2 is typical, and
    * drops lead churn by weeks): per day the distinct actives over the
    * distinct actives of its fixed 28-DAY PERIOD from the corpus base
    * (integer period arithmetic — calendar months differ between
    * engines' date libraries; a fixed 28-day window doesn't). Two
    * distinct aggregations + a broadcast period join; the ratio is
    * one raw IEEE division of exact counts (§4). */
  def stickiness(events: DataFrame,
                 baseUs: Long = 1704067200000000L): DataFrame = {
    val s = Series.samples(events).filter(col("ts_us") >= baseUs)
    val daily = s
      .groupBy(expr(s"(ts_us - $baseUs) div 86400000000").as("day"))
      .agg(count_distinct(col("user_id")).as("dau"))
      .withColumn("period", expr("day div 28"))
    val monthly = s
      .groupBy(expr(s"(ts_us - $baseUs) div 2419200000000").as("period"))
      .agg(count_distinct(col("user_id")).as("mau"))
    daily.join(broadcast(monthly), "period")
      .select(col("day"), col("dau"), col("period"), col("mau"),
        (col("dau").cast("double") / col("mau").cast("double"))
          .as("stickiness"))
  }

  /** GAP / AVAILABILITY report per series — the scrape-health read
    * behind ts_absent's point-in-time answer (absent says "is it dead
    * NOW"; this says "how often did it go quiet, for how long, and
    * what fraction of its life was it reporting" — the exporter-
    * flakiness triage list, sorted by worst). Per series: inter-
    * sample gaps over `gapUs` (count, max, total) from ONE partitioned
    * lag pass, the series' own [first, last] span, and
    * availability = 1 − total_gap/span. Only series with ≥1 gap
    * emit (the healthy majority would drown the report — stated).
    * Exact integer microseconds end to end; availability is one raw
    * IEEE division (§4). */
  def gapReport(events: DataFrame,
                gapUs: Long = 2L * 86400L * 1000000L): DataFrame = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val w = Window.partitionBy(col("series_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Series.samples(events)
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .groupBy(col("series_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        min(col("ts_us")).as("first_us"),
        max(col("ts_us")).as("last_us"),
        sum(when(col("gap") > gapUs, 1L).otherwise(0L)).as("n_gaps"),
        max(when(col("gap") > gapUs, col("gap"))).as("max_gap_us"),
        sum(when(col("gap") > gapUs, col("gap")).otherwise(0L))
          .as("total_gap_us"))
      .filter(col("n_gaps") > 0)
      .withColumn("availability",
        lit(1.0) - col("total_gap_us").cast("double")
          / (col("last_us") - col("first_us")).cast("double"))
  }

  /** VALUE HEATMAP — (time-bucket × value-bucket) counts per type,
    * the Grafana heatmap panel's data shape (a latency/value
    * DISTRIBUTION per time slice, where ts_value_histogram collapses
    * time and ts_downsample_* collapse the distribution): 6h time
    * buckets, width-10 value buckets capped at the overflow bucket.
    * Bucket keys are exact integer/floor arithmetic both engines
    * share (2dp values against multiple-of-10 boundaries — the
    * division is exact at the boundary); counts exact (§4). ONE hash
    * aggregation, grain bounded by types × slices × buckets. */
  def valueHeatmap(events: DataFrame, bucketUs: Long = 21600000000L,
                   valueWidth: Double = 10.0, maxBucket: Int = 10): DataFrame =
    Series.samples(events)
      .groupBy(col("event_type"),
        expr(s"ts_us div $bucketUs").as("t_bucket"),
        least(floor(col("value") / valueWidth), lit(maxBucket.toLong))
          .cast("long").as("v_bucket"))
      .agg(count(lit(1)).as("n"))

  /** SEASONAL DECOMPOSITION (STL-lite) — the hourly series split into
    * observed = profile + residual per (type, hour), at SERIES grain
    * (ts_seasonal_profile publishes the 24 profile means,
    * ts_seasonal_strength the one-number dial; this emits the usable
    * ARTIFACT — the residual series every downstream detector should
    * run on instead of the raw counts). profile = the hour-of-day
    * exact-decimal mean; residual = observed − profile as one IEEE
    * subtraction per row (§4). One profile aggregation + a broadcast
    * 24-row join per type. */
  def decompose(events: DataFrame): DataFrame = {
    val hourly = hourlyTypeCounts(events)
      .withColumn("hod", expr("hour % 24"))
    val prof = hourly.groupBy(col("event_type"), col("hod"))
      .agg((sum(col("c")).cast("double") / count(lit(1))).as("profile"))
    hourly.join(broadcast(prof), Seq("event_type", "hod"))
      .select(col("event_type"), col("hour").cast("long").as("hour"),
        col("hod").cast("long").as("hour_of_day"),
        col("c").cast("long").as("observed"), col("profile"),
        (col("c").cast("double") - col("profile")).as("residual"))
  }

  /** POST-STRATIFIED A/B estimate — the third member of the
    * experimentation toolkit next to CUPED (pre-period covariate) and
    * Welch (raw): stratify users by activity TERCILE and reweight the
    * per-stratum arm differences by stratum mass — kills the variance
    * an imbalanced heavy-user draw injects when no pre-period exists.
    * Tercile cuts are R-7 percentiles of the per-user event counts
    * rounded 6dp (the quantile tolerance rule); per-stratum moments
    * are exact decimals; the overall estimate Σ wₛ·diffₛ rounds each
    * term to 9dp decimal before the ORDER-FREE sum (§4 — a 3-term
    * double sum would still be partition-order-dependent). */
  def abStratified(events: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val d9 = org.apache.spark.sql.types.DecimalType(28, 9)
    val per = Series.samples(events)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast(d2)).as("m"), count(lit(1)).as("n_ev"))
      .withColumn("variant", pmod(col("user_id"), lit(2L)))
    val cuts = per.agg(
      round(expr("percentile(CAST(n_ev AS DOUBLE), 0.33)"), 6).as("t1"),
      round(expr("percentile(CAST(n_ev AS DOUBLE), 0.67)"), 6).as("t2"))
    val strat = per.crossJoin(broadcast(cuts))
      .withColumn("stratum",
        when(col("n_ev") <= col("t1"), 0L)
          .when(col("n_ev") <= col("t2"), 1L).otherwise(2L))
    val mom = strat.groupBy(col("stratum"), col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s1"))
    def side(v: Int, c: String) =
      max(when(col("variant") === v, col(c))).as(s"$c$v")
    val wide = mom.groupBy(col("stratum"))
      .agg(side(0, "n"), side(0, "s1"), side(1, "n"), side(1, "s1"))
      .withColumn("mean_0", col("s10").cast("double") / col("n0"))
      .withColumn("mean_1", col("s11").cast("double") / col("n1"))
      .withColumn("diff", col("mean_1") - col("mean_0"))
      .withColumn("n_users", col("n0") + col("n1"))
    val total = wide.agg(sum(col("n_users")).as("n_total"))
    val withW = wide.crossJoin(broadcast(total))
      .withColumn("weight",
        col("n_users").cast("double") / col("n_total").cast("double"))
    val overall = withW
      .agg(sum(round(col("weight") * col("diff"), 9).cast(d9)).as("sd"))
      .select(col("sd").cast("double").as("strat_diff"))
    withW
      .select(col("stratum"), col("n0"), col("n1"), col("mean_0"),
        col("mean_1"), col("diff"), col("weight"))
      .crossJoin(broadcast(overall))
  }

  /** ANOMALY ENSEMBLE — the z / MAD / Tukey detectors VOTING per
    * (type, hour) (each has a blind spot: z gets inflated by its own
    * outlier, MAD collapses on half-constant data, fences go
    * degenerate at IQR 0 — an hour two-of-three agree on is worth an
    * alert; any single vote is a "look"). Reuses the established
    * shapes verbatim: exact decimal moments (esd), round-6 R-7
    * median/MAD/quartiles; every compare runs on identical computed
    * doubles (§4). Emits only voted hours with the per-detector
    * breakdown. */
  def anomalyVotes(events: DataFrame): DataFrame = {
    val hourly = hourlyTypeCounts(events)
    val mo = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).cast("double").as("s1"),
        sum(col("c") * col("c")).cast("double").as("s2"),
        round(expr("percentile(CAST(c AS DOUBLE), 0.5)"), 6).as("med"),
        round(expr("percentile(CAST(c AS DOUBLE), 0.25)"), 6).as("q1"),
        round(expr("percentile(CAST(c AS DOUBLE), 0.75)"), 6).as("q3"))
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("std", sqrt(col("s2") / col("n")
        - (col("s1") / col("n")) * (col("s1") / col("n"))))
    val mad = hourly.join(broadcast(mo.select(col("event_type"), col("med"))),
        "event_type")
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(abs(CAST(c AS DOUBLE) - med), 0.5)"), 6)
        .as("mad"))
    hourly.join(broadcast(mo), "event_type").join(broadcast(mad), "event_type")
      .withColumn("vote_z",
        when(col("std") > 0 &&
          abs(col("c").cast("double") - col("mean")) / col("std") > 3, 1L)
          .otherwise(0L))
      .withColumn("vote_mad",
        when(abs(col("c").cast("double") - col("med")) > lit(3.5) * col("mad"),
          1L).otherwise(0L))
      .withColumn("vote_iqr",
        when(col("c") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
             col("c") > col("q3") + lit(1.5) * (col("q3") - col("q1")), 1L)
          .otherwise(0L))
      .withColumn("votes", col("vote_z") + col("vote_mad") + col("vote_iqr"))
      .filter(col("votes") > 0)
      .select(col("event_type"), col("hour").cast("long").as("hour"),
        col("c").cast("long").as("cnt"), col("vote_z"), col("vote_mad"),
        col("vote_iqr"), col("votes"))
  }

  /** A/A CALIBRATION harness — run the Welch test over `nSplits`
    * DIFFERENT (deterministic, hash-derived) null splits of the same
    * population and report each verdict (the experimentation-platform
    * health check: a correctly-calibrated stack rejects ≈ α of A/A
    * tests; systematically more means the variance model or the
    * assignment hash is broken — found BEFORE anyone trusts a real
    * experiment). Split k assigns each user by
    * Md5Prefix(user_id # k) mod 2 — restatable hex-substring form,
    * independent across k by construction. Per split the abWelch
    * moment shapes verbatim on exact decimal totals (§4). Output one
    * row per split; the reader compares the flag fraction to α.
    * Scale: per-user totals reduce ONCE and every split reuses the
    * persisted frame — nSplits cheap aggregations, not nSplits corpus
    * scans. */
  def abAaCalibration(events: DataFrame, nSplits: Int = 20): DataFrame = {
    require(nSplits >= 1 && nSplits <= 1000, s"nSplits in [1, 1000], got $nSplits")
    val spark = events.sparkSession
    import spark.implicits._
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val per = Series.samples(events)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast(d2)).as("m"))
      .persist()
    val splits = broadcast((1 to nSplits).map(_.toLong).toDF("split_id"))
    val assigned = per.crossJoin(splits)
      .withColumn("variant",
        pmod(graft.functions.Md5Prefix(
          concat(col("user_id").cast("string"), lit("#"),
            col("split_id").cast("string")), 15), lit(2L)))
    val mom = assigned
      .groupBy(col("split_id"), col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s1"),
        sum(col("m") * col("m")).as("s2"))
    def side(v: Int, c: String) =
      max(when(col("variant") === v, col(c))).as(s"$c$v")
    mom.groupBy(col("split_id"))
      .agg(side(0, "n"), side(0, "s1"), side(0, "s2"),
        side(1, "n"), side(1, "s1"), side(1, "s2"))
      .withColumn("mean_0", col("s10").cast("double") / col("n0"))
      .withColumn("mean_1", col("s11").cast("double") / col("n1"))
      .withColumn("v0",
        (col("s20").cast("double") - col("s10").cast("double")
          * col("s10").cast("double") / col("n0")) / (col("n0") - 1))
      .withColumn("v1",
        (col("s21").cast("double") - col("s11").cast("double")
          * col("s11").cast("double") / col("n1")) / (col("n1") - 1))
      .withColumn("t_stat",
        (col("mean_0") - col("mean_1"))
          / sqrt(col("v0") / col("n0") + col("v1") / col("n1")))
      .withColumn("significant",
        when(abs(col("t_stat")) > 1.96, 1L).otherwise(0L))
      .select(col("split_id"), col("n0"), col("n1"), col("t_stat"),
        col("significant"))
  }

  /** SEASONAL ALERT THRESHOLD per (type, hour-of-day) — the
    * seasonality-aware baseline static alerts lack (a 9am traffic
    * level that is normal at 9am is an incident at 3am; ts_mad_outliers
    * computes one global band, this computes 24): per cell the R-7
    * median of that hour-of-day's counts, the MAD around it, and the
    * upper band median + k·MAD. Both percentile passes round to 6dp
    * (the madOutliers cross-engine discipline — a last-ULP R-7
    * difference must not propagate into the band); the band is one
    * fixed-shape expression (§4). Per-cell state is bounded by days
    * per cell; two aggregations on the reduced hourly frame. */
  def seasonalThreshold(events: DataFrame, kMad: Double = 3.0): DataFrame = {
    require(kMad > 0, s"kMad must be positive, got $kMad")
    val hourly = hourlyTypeCounts(events)
      .withColumn("hod", expr("hour % 24"))
    val med = hourly.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_hours"),
        round(expr("percentile(CAST(c AS DOUBLE), 0.5)"), 6).as("median"))
    hourly.join(med, Seq("event_type", "hod"))
      .groupBy(col("event_type"), col("hod").as("hour_of_day"),
        col("n_hours"), col("median"))
      .agg(round(expr("percentile(abs(CAST(c AS DOUBLE) - median), 0.5)"), 6)
        .as("mad"))
      .withColumn("threshold", col("median") + lit(kMad) * col("mad"))
  }

  /** POOLED D1/D7/D14 RETENTION headline — the three numbers a growth
    * dashboard leads with, pooled across cohorts the CENSORING-AWARE
    * way (the survival_km honesty rule at summary grain): a cohort
    * only counts toward Dn once the corpus horizon has actually shown
    * it n days — pooling unobservable cohorts into the denominator
    * biases every rate down. Exact integers: first-seen day per user,
    * distinct (user, day) activity, one semi-join per offset on the
    * user-reduced frames; rate = ONE IEEE division (§4). */
  def retentionHeadline(events: DataFrame,
                        days: Seq[Int] = Seq(1, 7, 14)): DataFrame = {
    require(days.nonEmpty && days.forall(_ >= 1), s"day offsets >= 1: $days")
    val spark = events.sparkSession
    import spark.implicits._
    val act = Series.samples(events)
      .select(col("user_id"), expr("ts_us div 86400000000").as("day"))
      .distinct().persist()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val horizon = act.agg(max(col("day")).as("max_day"))
    val dd = days.map(_.toLong).toDF("d")
    val eligible = first.crossJoin(broadcast(horizon))
      .crossJoin(broadcast(dd))
      .filter(col("first_day") + col("d") <= col("max_day"))
    val retained = eligible.alias("e")
      .join(act.alias("a"),
        col("a.user_id") === col("e.user_id") &&
          col("a.day") === col("e.first_day") + col("e.d"), "left_semi")
    val el = eligible.groupBy(col("d")).agg(count(lit(1)).as("n_eligible"))
    val re = retained.groupBy(col("d")).agg(count(lit(1)).as("n_retained"))
    el.join(re, Seq("d"), "left")
      .select(col("d"), col("n_eligible"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        (coalesce(col("n_retained"), lit(0L)).cast("double")
          / col("n_eligible").cast("double")).as("rate"))
  }

  /** MINIMUM DETECTABLE EFFECT for the A/B assignment — the POWER
    * side of the Welch/MWU duo ("is the test even big enough to see
    * the lift we care about?" — the question to ask BEFORE running
    * either significance test; an underpowered experiment that reads
    * "not significant" proves nothing). Classic two-sample normal
    * approximation at 5%/80%: MDE = (z_α/2 + z_β)·s_p·√(1/n0 + 1/n1)
    * with the pooled SD from exact decimal per-user moments; the z
    * constants are driver-side literals shared verbatim with the
    * oracle (the periodogram literal pattern). One row: arm sizes,
    * pooled SD, absolute and relative MDE — every statistic a
    * fixed-shape IEEE expression over exact sums (§4). */
  val MdeZ: Double = 1.96 + 0.8416 // z_{0.025} + z_{0.20}, textbook 4dp
  def abMde(events: DataFrame): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val per = Series.samples(events)
      .groupBy(col("user_id"))
      .agg(sum(col("value").cast(d2)).as("m"))
    val mom = per
      .groupBy(pmod(col("user_id"), lit(2L)).as("variant"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s1"),
        sum(col("m") * col("m")).as("s2"))
    def side(v: Int, c: String) =
      max(when(col("variant") === v, col(c))).as(s"$c$v")
    mom.agg(side(0, "n"), side(0, "s1"), side(0, "s2"),
        side(1, "n"), side(1, "s1"), side(1, "s2"))
      .withColumn("ss0", col("s20").cast("double")
        - col("s10").cast("double") * col("s10").cast("double") / col("n0"))
      .withColumn("ss1", col("s21").cast("double")
        - col("s11").cast("double") * col("s11").cast("double") / col("n1"))
      .withColumn("pooled_sd",
        sqrt((col("ss0") + col("ss1")) / (col("n0") + col("n1") - 2)))
      .withColumn("grand_mean",
        (col("s10").cast("double") + col("s11").cast("double"))
          / (col("n0") + col("n1")))
      .withColumn("mde_abs",
        lit(MdeZ) * col("pooled_sd")
          * sqrt(lit(1.0) / col("n0") + lit(1.0) / col("n1")))
      .withColumn("mde_rel", col("mde_abs") / col("grand_mean"))
      .select(col("n0"), col("n1"), col("pooled_sd"), col("grand_mean"),
        col("mde_abs"), col("mde_rel"))
  }

  /** LONGEST ABOVE-MEAN STREAK per series — gaps-and-islands over the
    * hourly counts (the "how long did the elevated period RUN" read
    * that point detectors and zone rules both miss; an 18-hour
    * sustained elevation is a different incident than 18 scattered
    * spikes). Islands via the classic hour − row_number() grouping
    * key; threshold = the series' own mean (fractional — integer
    * counts can't sit ON it, so the strict compare has no edge case).
    * Determinism: mean from exact decimal sums (the esd shape),
    * identical compare both engines, longest = max length with the
    * earliest start as tiebreak via a second bounded aggregation.
    * Per-series bounded windows on the reduced hourly frame. */
  def streaks(events: DataFrame): DataFrame = {
    val hourly = hourlyTypeCounts(events)
    val mean = hourly.groupBy(col("event_type"))
      .agg((sum(col("c")).cast("double") / count(lit(1))).as("mean"))
    val above = hourly.join(broadcast(mean), "event_type")
      .filter(col("c") > col("mean"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("hour"))))
      .withColumn("grp", col("hour") - col("rn"))
    val islands = above.groupBy(col("event_type"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("hour")).as("start_hour"))
    val longest = islands.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_islands"), max(col("len")).as("longest_len"))
    islands.join(longest, "event_type")
      .filter(col("len") === col("longest_len"))
      .groupBy(col("event_type"), col("n_islands"), col("longest_len"))
      .agg(min(col("start_hour")).cast("long").as("longest_start_hour"))
  }

  /** CAPACITY ETA — "at this growth rate, when do we hit X× today's
    * level?" (the disk-full / quota-burn panel next to
    * ts_predict_linear's raw extrapolation): per type, OLS over the
    * DAILY totals (exact integer sufficient statistics — day indexes
    * × counts), the fitted current level, cap = capFactor × current,
    * and days_to_cap = current·(capFactor−1)/slope — NULL when the
    * series isn't growing (slope ≤ 0: honest, never negative ETAs).
    * Every statistic is ONE fixed-shape IEEE expression over exact
    * integer sums (§4). One hash aggregation past the daily
    * reduction. */
  def capacityEta(events: DataFrame, capFactor: Double = 2.0): DataFrame = {
    require(capFactor > 1.0, s"capFactor must exceed 1, got $capFactor")
    val daily = Series.samples(events)
      .groupBy(col("event_type"), expr("ts_us div 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val st = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("day")).as("sx"), sum(col("c")).as("sy"),
        sum(col("day") * col("c")).as("sxy"),
        sum(col("day") * col("day")).as("sxx"),
        max(col("day")).as("last_day"))
      .filter(col("n") >= 2)
    st
      .withColumn("slope",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx")) / col("n"))
      .withColumn("current_fit",
        col("intercept") + col("slope") * col("last_day"))
      .withColumn("days_to_cap",
        when(col("slope") > 0 && col("current_fit") > 0,
          col("current_fit") * lit(capFactor - 1.0) / col("slope")))
      .select(col("event_type"), col("n").as("n_days"), col("slope"),
        col("current_fit"), col("days_to_cap"))
  }

  /** FIRST-TOUCH attribution — the acquisition-credit counterpart of
    * [[attribution]]'s last-touch and [[attributionLinear]]'s split
    * (the three models marketing reporting quotes side by side; first
    * touch answers "which channel STARTED the journey"). Per purchase,
    * the EARLIEST click inside the 24h window [p−24h, p] gets the
    * credit; the join is time-LOCAL (clicks within one window of the
    * purchase — never a full history scan per purchase) and the
    * per-purchase reduction is one min(). Day-grain report with exact
    * DECIMAL value sums and the exact integer lead-time mass (§4). */
  def attributionFirst(events: DataFrame,
                       windowUs: Long = 86400000000L): DataFrame = {
    val d2 = org.apache.spark.sql.types.DecimalType(28, 2)
    val sm = Series.samples(events)
    val p = sm.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val c = sm.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us").as("click_ts")).distinct()
    p.join(c,
        p("user_id") === c("user_id") &&
          col("click_ts") <= col("ts_us") &&
          col("click_ts") >= col("ts_us") - windowUs, "left")
      .drop(c("user_id"))
      .groupBy(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      .agg(min(col("click_ts")).as("first_click_ts"))
      .groupBy(expr("ts_us div 86400000000").as("day"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(when(col("first_click_ts").isNotNull, 1L).otherwise(0L))
          .as("n_attributed"),
        sum(when(col("first_click_ts").isNotNull, col("value"))
          .otherwise(0.0).cast(d2)).cast("double").as("attributed_value"),
        sum(when(col("first_click_ts").isNotNull,
          col("ts_us") - col("first_click_ts")).otherwise(0L))
          .as("sum_lead_us"))
  }

  /** AUDIENCE OVERLAP between event types — |users(a) ∩ users(b)| and
    * Jaccard per unordered pair (the segment-overlap read behind
    * cross-sell and cannibalization questions; events_lift_matrix
    * asks "do they co-occur per session?", this asks "is it the same
    * PEOPLE at all?"). One distinct (type, user) reduction, a
    * self-join SHUFFLED ON user_id (each user contributes its own
    * type-pair fan-out — bounded by types², never a cross join),
    * broadcast per-type sizes; exact integers, one IEEE division
    * (§4). */
  def audienceOverlap(events: DataFrame): DataFrame = {
    val ut = Series.samples(events)
      .select(col("event_type"), col("user_id")).distinct()
    val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val inter = ut.alias("a")
      .join(ut.alias("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter").cast("double")
          / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
          .as("jaccard"))
  }
}
