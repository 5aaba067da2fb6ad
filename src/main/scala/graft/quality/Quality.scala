package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ/great-
  * expectations role — monolith's ecosystem has no equivalent; any
  * pipeline feeding a 100 TB training run fronts its ingest with one
  * of these).
  *
  * Scale design is the whole point of the API split:
  *   - [[rowChecks]]: EVERY row-grain constraint on a table folds into
  *     ONE conditional-aggregate scan (map-side partials, no shuffle
  *     beyond the single-row final agg), however many checks ride it.
  *     Adding a constraint is free; a naive one-query-per-check
  *     harness would re-scan 100 TB per constraint.
  *   - [[uniqueCheck]]: one hash aggregation on the key columns; the
  *     violation count is Σ(cnt)−#keys from the same pass, never a
  *     self-join.
  *   - [[refCheck]]: the parent projects to DISTINCT keys first (the
  *     only columns the constraint needs), then the child LEFT-joins
  *     it — broadcast when the parent is dimension-sized, shuffle on
  *     keys otherwise, and in both cases the bytes moved are keys,
  *     not rows. Orphan counting happens in the same aggregation.
  *
  * Every verdict row is (check, n_rows, n_violations, violation_rate,
  * pass) at the check's own grain; rates stay raw IEEE divisions of
  * exact counts (deterministic). */
object Quality {

  /** One row-grain constraint: `violated` is the per-row predicate
    * that COUNTS AGAINST the table (true = bad row). */
  case class RowCheck(name: String, violated: Column)

  private def verdict(df: DataFrame): DataFrame =
    df.select(col("check_name"), col("n_rows"), col("n_violations"),
      (col("n_violations").cast("double") / col("n_rows").cast("double"))
        .as("violation_rate"),
      (col("n_violations") === 0L).as("pass"))

  /** All row-grain checks on one table in ONE scan. Check names never
    * enter generated SQL: internal aliases are positional (`__c0`…)
    * and the name re-enters as a `lit` literal in the stack, so any
    * name — quotes, spaces, reserved words — is safe. */
  def rowChecks(table: DataFrame, checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = count(lit(1)).as("n_rows") +: checks.zipWithIndex.map {
      case (c, i) => sum(when(c.violated, 1L).otherwise(0L)).as(s"__c$i")
    }
    val one = table.agg(aggs.head, aggs.tail: _*)
    val stacked = stack(lit(checks.size) +: checks.zipWithIndex.flatMap {
      case (c, i) => Seq(lit(c.name), col(s"__c$i"))
    }: _*)
    verdict(one.select(col("n_rows"), stacked)
      .withColumnRenamed("col0", "check_name")
      .withColumnRenamed("col1", "n_violations"))
  }

  /** Key-uniqueness: n_violations = rows carrying an already-used key
    * (total rows − distinct keys), from one aggregation pass. */
  def uniqueCheck(name: String, table: DataFrame, keys: Seq[String]): DataFrame =
    verdict(table.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
      .select(lit(name).as("check_name"), col("n_rows"),
        (col("n_rows") - col("n_keys")).as("n_violations")))

  /** Referential integrity child→parent: orphan child rows. The
    * parent side reduces to distinct keys before the join;
    * `broadcastParent` pins the dimension-table case. */
  def refCheck(name: String, child: DataFrame, childKey: String,
               parent: DataFrame, parentKey: String,
               broadcastParent: Boolean = false): DataFrame = {
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("__present", lit(1))
    val pkSide = if (broadcastParent) broadcast(pk) else pk
    verdict(child.select(col(childKey)).join(pkSide, Seq(childKey), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__present").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations")))
  }

  /** Completeness parent→child: parent rows with NO child (an order
    * that never got a line). Same key-only join shape, reversed. */
  def hasChildrenCheck(name: String, parent: DataFrame, parentKey: String,
                       child: DataFrame, childKey: String): DataFrame = {
    val ck = child.select(col(childKey).as(parentKey)).distinct()
      .withColumn("__present", lit(1))
    verdict(parent.select(col(parentKey)).join(ck, Seq(parentKey), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__present").isNull, 1L).otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations")))
  }

  /** Cross-table aggregate consistency: |orders.o_totalprice −
    * Σ lines extendedprice·(1−discount)·(1+tax)| ≤ tol, at the grain
    * of orders that HAVE lines (order-less orders are
    * [[hasChildrenCheck]]'s finding, not this one's). Line amounts are
    * exact ≤6-decimal quantities (2dp price × 2dp discount × 2dp tax),
    * so both the per-line round-to-6dp and the DECIMAL sums are
    * order-independent — the comparison is exact, not FP-lucky. */
  def totalpriceConsistent(name: String, orders: DataFrame, lineitem: DataFrame,
                           tolerance: Double = 0.02): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val lineSums = lineitem
      .select(col("l_orderkey").as("o_orderkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax")), 6).cast(dec).as("amt"))
      .groupBy(col("o_orderkey")).agg(sum(col("amt")).as("line_total"))
    verdict(orders
      .select(col("o_orderkey"), round(col("o_totalprice"), 6).cast(dec).as("tp"))
      .join(lineSums, Seq("o_orderkey"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(abs(col("tp") - col("line_total")) > tolerance, 1L)
          .otherwise(0L)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations")))
  }

  /** Per-column PROFILE of a table — the discovery half of the DQ
    * story (run the profiler, read the stats, then write [[rowChecks]]
    * constraints against what you learned). nulls/min/max for EVERY
    * column fold into one scan; each column's EXACT distinct count
    * runs as its own single-distinct aggregation over a COLUMN-PRUNED
    * scan. Deliberately NOT one multi-distinct aggregate: Spark plans
    * C simultaneous distincts through an Expand that multiplies the
    * row stream by C before the shuffle — measured 28× wall at 100×
    * data — while C pruned single-column distincts read the same
    * total bytes off columnar storage and each keeps the specialized
    * two-phase distinct plan (re-measured 2.3× at 100×, was 28×). min/max
    * stringify so one report covers mixed types; pre-cast doubles to
    * DECIMAL for format-stable strings. */
  def profile(table: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile at least one column")
    // column names never enter generated SQL: access is backtick-
    // quoted (so dots, spaces, quotes and reserved words resolve as
    // the literal name), internal aliases are positional and the name
    // re-enters as a lit literal in the stack
    require(columns.forall(!_.contains("`")),
      "column names containing a backtick are not supported")
    def c(name: String): Column = col(s"`$name`")
    val aggs = count(lit(1)).as("n_rows") +: columns.zipWithIndex.flatMap {
      case (cn, i) =>
        Seq(sum(when(c(cn).isNull, 1L).otherwise(0L)).as(s"__n$i"),
          min(c(cn)).cast("string").as(s"__mn$i"),
          max(c(cn)).cast("string").as(s"__mx$i"))
    }
    val one = table.agg(aggs.head, aggs.tail: _*)
    val stacked = stack(lit(columns.size) +: columns.zipWithIndex.flatMap {
      case (cn, i) => Seq(lit(cn), col(s"__n$i"), col(s"__mn$i"), col(s"__mx$i"))
    }: _*)
    val base = one.select(col("n_rows"), stacked)
      .withColumnRenamed("col0", "column_name")
      .withColumnRenamed("col1", "n_nulls")
      .withColumnRenamed("col2", "min_value")
      .withColumnRenamed("col3", "max_value")
    val dists = columns.map { cn =>
      table.select(c(cn))
        .agg(count_distinct(c(cn)).as("n_distinct"))
        .select(lit(cn).as("column_name"), col("n_distinct"))
    }.reduce(_.unionByName(_))
    base.join(broadcast(dists), Seq("column_name"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"),
        (col("n_nulls").cast("double") / col("n_rows").cast("double"))
          .as("null_rate"))
  }

  // ── verdict persistence + trending (the other half of the Deequ
  // role: anomaly detection on the metrics OVER TIME, not just the
  // point-in-time gate) ──

  /** Persist one run's verdict frame into a run-partitioned store.
    * Verdicts are check-grain (a handful of rows per run however big
    * the data), so the store stays tiny forever; partitioning by
    * run_id makes a re-run of the same run_id IDEMPOTENT (dynamic
    * partition overwrite replaces exactly that run) and gives the
    * trend reader per-run partition pruning. */
  def persistVerdicts(storePath: String, runId: String, verdicts: DataFrame): Unit = {
    require(runId.nonEmpty && !runId.contains("/"), s"bad run_id '$runId'")
    verdicts.withColumn("run_id", lit(runId))
      .repartition(1) // check-grain: one small file per run
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id").parquet(storePath)
  }

  def readVerdicts(spark: org.apache.spark.sql.SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)

  /** Grouped variant of [[rowChecks]] for BACKFILLING a verdict store:
    * every run's row-grain checks fold into ONE grouped scan (run_id
    * is just another aggregation key — R runs cost one pass, not R),
    * where the per-ingest-batch path stays [[rowChecks]] +
    * [[persistVerdicts]]. Same positional-alias discipline. */
  def rowChecksBy(table: DataFrame, runId: Column,
                  checks: Seq[RowCheck]): DataFrame = {
    require(checks.nonEmpty, "at least one check")
    val aggs = count(lit(1)).as("n_rows") +: checks.zipWithIndex.map {
      case (c, i) => sum(when(c.violated, 1L).otherwise(0L)).as(s"__c$i")
    }
    val one = table.groupBy(runId.as("run_id")).agg(aggs.head, aggs.tail: _*)
    val stacked = stack(lit(checks.size) +: checks.zipWithIndex.flatMap {
      case (c, i) => Seq(lit(c.name), col(s"__c$i"))
    }: _*)
    verdictWithRun(one.select(col("run_id"), col("n_rows"), stacked)
      .withColumnRenamed("col0", "check_name")
      .withColumnRenamed("col1", "n_violations"))
  }

  /** Grouped [[uniqueCheck]]: per-run key-uniqueness from one grouped
    * aggregation pass. */
  def uniqueCheckBy(name: String, table: DataFrame, runId: Column,
                    keys: Seq[String]): DataFrame =
    verdictWithRun(table
      .groupBy(runId.as("run_id") +: keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("run_id"))
      .agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
      .select(col("run_id"), lit(name).as("check_name"), col("n_rows"),
        (col("n_rows") - col("n_keys")).as("n_violations")))

  private def verdictWithRun(df: DataFrame): DataFrame =
    df.select(col("run_id"), col("check_name"), col("n_rows"), col("n_violations"),
      (col("n_violations").cast("double") / col("n_rows").cast("double"))
        .as("violation_rate"),
      (col("n_violations") === 0L).as("pass"))

  /** Backfill many runs in ONE partitioned write: `verdicts` carries
    * its own run_id column (from [[rowChecksBy]]/[[uniqueCheckBy]]);
    * dynamic partition overwrite keeps re-backfills idempotent per
    * run. One write job instead of one per run — the difference
    * between a history backfill that scans the fact table R times and
    * one that scans it once. */
  def persistVerdictsBulk(storePath: String, verdicts: DataFrame): Unit =
    verdicts
      .repartition(col("run_id"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_id").parquet(storePath)

  /** Per-check TREND over the persisted runs: how often the check
    * passed, the lifetime violation mass, the LATEST run's rate next
    * to the rate of all PRIOR runs pooled, and an anomaly flag
    * (latest more than doubles the prior rate, or violates where
    * priors were clean) — the read a pipeline does before trusting
    * today's ingest. Determinism: every rate is one IEEE division of
    * exact counts (prior pools counts, never averages doubles); the
    * latest run resolves by max(run_id) string order — run ids must
    * sort chronologically (the y2001 / 20260815T convention).
    * Runs × checks rows in, checks rows out — scale-free. */
  def trend(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("check_name"))
      .agg(
        count(lit(1)).as("n_runs"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_passed"),
        sum(col("n_violations")).as("total_violations"),
        sum(col("n_rows")).as("total_rows"),
        max(struct(col("run_id"), col("n_violations"), col("n_rows"))).as("l"))
      .select(col("check_name"), col("n_runs"), col("n_passed"),
        (col("n_passed").cast("double") / col("n_runs").cast("double")).as("pass_rate"),
        col("total_violations"), col("total_rows"),
        col("l.run_id").as("latest_run"),
        (col("l.n_violations").cast("double") / col("l.n_rows").cast("double"))
          .as("latest_violation_rate"),
        when(col("total_rows") > col("l.n_rows"),
          (col("total_violations") - col("l.n_violations")).cast("double")
            / (col("total_rows") - col("l.n_rows")).cast("double"))
          .otherwise(lit(0.0)).as("prior_violation_rate"))
      .withColumn("anomaly",
        (col("prior_violation_rate") === 0.0 && col("latest_violation_rate") > 0.0) ||
          col("latest_violation_rate") > lit(2.0) * col("prior_violation_rate"))

  /** The lineitem constraint set shared by [[tpchSuite]] and the
    * trend gate. */
  val LineitemChecks: Seq[RowCheck] = Seq(
    RowCheck("li_quantity_range",
      !(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0)),
    RowCheck("li_price_positive", col("l_extendedprice") <= 0.0),
    RowCheck("li_discount_range",
      !(col("l_discount") >= 0.0 && col("l_discount") <= 0.1)),
    RowCheck("li_tax_range", !(col("l_tax") >= 0.0 && col("l_tax") <= 0.08)),
    RowCheck("li_returnflag_domain", !col("l_returnflag").isin("A", "N", "R")),
    RowCheck("li_keys_nonnull",
      col("l_orderkey").isNull || col("l_partkey").isNull
        || col("l_suppkey").isNull))

  /** The per-run slice of [[tpchSuite]] a trend store ingests: the
    * lineitem row-grain checks plus line-key uniqueness, at whatever
    * grain the caller slices runs by (a ship-year here, an ingest
    * batch in production). */
  def lineitemRunChecks(slice: DataFrame): DataFrame =
    rowChecks(slice, LineitemChecks)
      .unionByName(uniqueCheck("li_line_unique", slice,
        Seq("l_orderkey", "l_linenumber")))

  /** All runs at once for a history BACKFILL: one grouped scan for
    * the row checks + one for uniqueness, however many runs. */
  def lineitemRunChecksBy(li: DataFrame, runId: Column): DataFrame =
    rowChecksBy(li, runId, LineitemChecks)
      .unionByName(uniqueCheckBy("li_line_unique", li, runId,
        Seq("l_orderkey", "l_linenumber")))

  /** The shipped suite over the TPC-H-ish trio: 11 row-grain checks in
    * THREE scans (one per table), two uniqueness aggregations, two
    * key-projected referential joins, one completeness join, one
    * consistency join — 17 verdicts. The synthetic data genuinely
    * fails three of them (duplicate (orderkey, linenumber) pairs,
    * orders with no lines, totalprice drift), which is what makes the
    * suite a real gate rather than a tautology. */
  def tpchSuite(lineitem: DataFrame, orders: DataFrame,
                customer: DataFrame): DataFrame = {
    val li = rowChecks(lineitem, Seq(
      RowCheck("li_quantity_range",
        !(col("l_quantity") >= 1.0 && col("l_quantity") <= 50.0)),
      RowCheck("li_price_positive", col("l_extendedprice") <= 0.0),
      RowCheck("li_discount_range",
        !(col("l_discount") >= 0.0 && col("l_discount") <= 0.1)),
      RowCheck("li_tax_range", !(col("l_tax") >= 0.0 && col("l_tax") <= 0.08)),
      RowCheck("li_returnflag_domain", !col("l_returnflag").isin("A", "N", "R")),
      RowCheck("li_keys_nonnull",
        col("l_orderkey").isNull || col("l_partkey").isNull
          || col("l_suppkey").isNull)))
    val ord = rowChecks(orders, Seq(
      RowCheck("ord_status_domain", !col("o_orderstatus").isin("F", "O", "P")),
      RowCheck("ord_totalprice_positive", col("o_totalprice") <= 0.0),
      RowCheck("ord_date_range",
        !(col("o_orderdate") >= lit("1992-01-01").cast("timestamp")
          && col("o_orderdate") < lit("2002-01-01").cast("timestamp")))))
    val cust = rowChecks(customer, Seq(
      RowCheck("cust_acctbal_range",
        !(col("c_acctbal") >= -1000.0 && col("c_acctbal") <= 10000.0)),
      RowCheck("cust_mktsegment_domain",
        !col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "FURNITURE",
          "HOUSEHOLD", "MACHINERY"))))
    li.unionByName(ord).unionByName(cust)
      .unionByName(uniqueCheck("ord_key_unique", orders, Seq("o_orderkey")))
      .unionByName(uniqueCheck("li_line_unique", lineitem,
        Seq("l_orderkey", "l_linenumber")))
      .unionByName(refCheck("li_orderkey_ref", lineitem, "l_orderkey",
        orders, "o_orderkey"))
      .unionByName(refCheck("ord_custkey_ref", orders, "o_custkey",
        customer, "c_custkey", broadcastParent = true))
      .unionByName(hasChildrenCheck("ord_has_lines", orders, "o_orderkey",
        lineitem, "l_orderkey"))
      .unionByName(totalpriceConsistent("ord_totalprice_consistent",
        orders, lineitem))
  }

  /** TABULAR PSI drift between two cohorts of a numeric column — the
    * population-stability gate a feature store runs between a
    * reference window and today (emb_drift_psi is its embedding
    * sibling; the tabular one is what catches a pricing change or an
    * upstream unit switch in plain columns). Integer binning on
    * FIXED-WIDTH buckets (floor(v/width) capped — no data-dependent
    * extents, so cohorts bin identically by construction), Laplace
    * (+1) smoothing so empty bins can't produce ±Inf, and the
    * driftPsi ln discipline: 9dp-decimal terms before the order-free
    * exact sum (§4). Output per bin with the total PSI attached —
    * one conditional-aggregate pass + broadcast totals. */
  def driftPsiTabular(table: DataFrame, valueCol: String, cohort: Column,
                      binWidth: Double, nBins: Int = 10,
                      roundTo: Int = 6): DataFrame = {
    require(nBins >= 2 && binWidth > 0, s"need nBins >= 2, width > 0")
    val dec = org.apache.spark.sql.types.DecimalType(28, 9)
    val binned = table
      .withColumn("grp", cohort)
      .filter(col("grp").isNotNull)
      .withColumn("bin",
        least(floor(col(valueCol) / binWidth), lit(nBins - 1L)).cast("long"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("n"))
    val totals = binned.groupBy(col("grp")).agg(sum(col("n")).as("tot"))
    val spark = table.sparkSession
    val grid = broadcast(spark.range(nBins).select(col("id").as("bin")))
    def side(g: String, nOut: String, pOut: String) = grid
      .join(binned.filter(col("grp") === g).select(col("bin"), col("n")),
        Seq("bin"), "left")
      .crossJoin(broadcast(totals.filter(col("grp") === g).select(col("tot"))))
      .select(col("bin"), coalesce(col("n"), lit(0L)).as(nOut),
        ((coalesce(col("n"), lit(0L)) + 1L).cast("double")
          / (col("tot") + nBins).cast("double")).as(pOut))
    val terms = side("a", "n_a", "pa").join(side("b", "n_b", "pb"), "bin")
      .withColumn("term",
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 9).cast(dec))
    val psi = terms.agg(round(sum(col("term")).cast("double"), roundTo).as("psi"))
    terms
      .select(col("bin"), col("n_a"), col("n_b"), col("pa"), col("pb"),
        col("term").cast("double").as("term"))
      .crossJoin(broadcast(psi))
  }

  /** Benford first-digit expected shares log10(1 + 1/d), computed ONCE
    * driver-side and inlined as LITERALS in both engines (the
    * ts_periodogram literal-trig pattern — the gate contains no
    * cross-engine log10 call at all). */
  val benfordShares: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  /** BENFORD first-significant-digit audit (Benford 1938; Nigrini's
    * fraud-detection staple — fabricated or templated numeric columns
    * betray themselves by a flat/spiky first-digit histogram where
    * organic multiplicative data follows log10(1+1/d)): digit shares
    * of `valueCol` against the Benford expectation with the χ²-style
    * per-digit deviation term (share−exp)²/exp. TPC-H prices are
    * synthetic-uniform, so the gate HONESTLY reports large deviations
    * — the audit's point is the measurement, not conformance.
    *
    * Determinism (§4): the digit comes from the FIXED-POINT DECIMAL
    * rendering (cast to DECIMAL(18,2) first — both engines print
    * decimals fixed-point, where raw double formatting diverges),
    * counts are exact, the expected shares are shared literals, and
    * share/deviation are fixed-shape double expressions on identical
    * operands. Scale: one conditional-aggregate scan (map-side
    * partials) plus a broadcast one-row total — the [[rowChecks]]
    * cost shape. */
  def benford(table: DataFrame, valueCol: String): DataFrame = {
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val digits = table
      .filter(col(valueCol).isNotNull)
      .select(regexp_extract(col(valueCol).cast(dec2).cast("string"),
        "[1-9]", 0).as("digit"))
      .filter(col("digit") =!= "")
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(count(lit(1)).as("n_total"))
    val expected = benfordShares.foldLeft(lit(null).cast("double")) {
      case (acc, (d, s)) =>
        when(col("digit") === d.toString, lit(s)).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("n_total"))
      .withColumn("expected", expected)
      .withColumn("dev",
        (col("share") - col("expected")) * (col("share") - col("expected"))
          / col("expected"))
      .select(col("digit"), col("n"), col("share"), col("expected"), col("dev"))
  }
}
