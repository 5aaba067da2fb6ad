package graft

import graft.quality.Quality
import graft.quality.Quality.RowCheck
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("rowChecks: all constraints fold into one scan; counts exact") {
    val t = Seq((1L, 10.0, "A"), (2L, -5.0, "B"), (3L, 0.0, "A"), (4L, 99.0, "Z"))
      .toDF("id", "v", "flag")
    val out = Quality.rowChecks(t, Seq(
      RowCheck("v_positive", col("v") <= 0.0),
      RowCheck("flag_domain", !col("flag").isin("A", "B"))))
      .select("check_name", "n_rows", "n_violations", "pass")
      .as[(String, Long, Long, Boolean)].collect().toMap2
    assert(out("v_positive") == ((4L, 2L, false)))
    assert(out("flag_domain") == ((4L, 1L, false)))
    // exactly ONE scan: a single aggregate feeds the stack generator
    val plan = Quality.rowChecks(t, Seq(RowCheck("a", col("v") < 0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "row checks split into multiple scans:\n" + plan)
  }

  test("uniqueCheck counts surplus rows per key, not distinct keys") {
    val t = Seq((1L, 1), (1L, 2), (1L, 3), (2L, 1)).toDF("k", "line")
    val byKey = Quality.uniqueCheck("u", t, Seq("k"))
      .select("n_rows", "n_violations", "pass")
      .as[(Long, Long, Boolean)].head()
    assert(byKey == ((4L, 2L, false)))
    val byPair = Quality.uniqueCheck("u2", t, Seq("k", "line"))
      .select("n_violations", "pass").as[(Long, Boolean)].head()
    assert(byPair == ((0L, true)))
  }

  test("refCheck flags orphans; hasChildrenCheck flags childless parents") {
    val child = Seq((1L, "x"), (2L, "y"), (9L, "orphan")).toDF("fk", "p")
    val parent = Seq((1L, "a"), (2L, "b"), (3L, "childless")).toDF("pk", "q")
    val r = Quality.refCheck("r", child, "fk", parent, "pk",
      broadcastParent = true)
      .select("n_rows", "n_violations").as[(Long, Long)].head()
    assert(r == ((3L, 1L)))
    val h = Quality.hasChildrenCheck("h", parent, "pk", child, "fk")
      .select("n_rows", "n_violations").as[(Long, Long)].head()
    assert(h == ((3L, 1L)))
  }

  test("totalpriceConsistent: exact-decimal sums, tolerance honored, lineless orders excluded") {
    val orders = Seq((1L, 30.0), (2L, 100.0), (3L, 5.0))
      .toDF("o_orderkey", "o_totalprice")
    val lines = Seq(
      (1L, 10.0, 0.0, 0.0), (1L, 20.0, 0.0, 0.0),   // sums to 30 exactly
      (2L, 50.0, 0.02, 0.04))                        // 50*0.98*1.04 = 50.96 ≠ 100
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val out = Quality.totalpriceConsistent("tp", orders, lines)
      .select("n_rows", "n_violations").as[(Long, Long)].head()
    assert(out == ((2L, 1L)), s"order 3 has no lines and must not count: $out")
    // within-tolerance drift passes
    val near = Quality.totalpriceConsistent("tp2",
      Seq((1L, 30.01)).toDF("o_orderkey", "o_totalprice"),
      Seq((1L, 30.0, 0.0, 0.0)).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax"))
      .select("n_violations").as[Long].head()
    assert(near == 0L)
  }

  test("profile: one scan, exact stats per column, null rate from the same pass") {
    val t = Seq((Some(1L), Some("a")), (Some(2L), None),
      (Some(2L), Some("c")), (None, Some("a"))).toDF("k", "s")
    val out = Quality.profile(t, Seq("k", "s"))
      .select("column_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value", "null_rate")
      .as[(String, Long, Long, Long, String, String, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("k") == (("k", 4L, 1L, 2L, "1", "2", 0.25)))
    assert(out("s") == (("s", 4L, 1L, 2L, "a", "c", 0.25)))
    // the scale pin: NO Expand anywhere — a multi-distinct aggregate
    // would multiply the row stream by the column count (measured 28×
    // wall at 100×); per-column single distincts keep the specialized
    // two-phase plan over pruned scans
    val plan = Quality.profile(t, Seq("k", "s")).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), "profile regrew the multi-distinct Expand:\n" + plan)
  }

  test("verdict store: idempotent re-run per run_id; trend pools prior counts and flags the shift") {
    val store = java.nio.file.Files.createTempDirectory("q_verdicts").toString
    def suite(rows: Seq[(Long, Double)]) = Quality.rowChecks(
      rows.toDF("k", "x"),
      Seq(Quality.RowCheck("x_nonneg", col("x") < 0.0)))
    // three clean runs, then a run where 2 of 4 rows violate
    Quality.persistVerdicts(store, "r1", suite(Seq((1L, 1.0), (2L, 2.0))))
    Quality.persistVerdicts(store, "r2", suite(Seq((1L, 1.0), (2L, 2.0))))
    Quality.persistVerdicts(store, "r3", suite(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))))
    Quality.persistVerdicts(store, "r4",
      suite(Seq((1L, 1.0), (2L, -1.0), (3L, -2.0), (4L, 4.0))))
    // idempotence: re-persisting r2 replaces ONLY that partition
    Quality.persistVerdicts(store, "r2", suite(Seq((1L, 1.0), (2L, 2.0))))
    val v = Quality.readVerdicts(spark, store)
    assert(v.count() == 4 && v.select("run_id").distinct().count() == 4)

    val t = Quality.trend(v)
      .select("check_name", "n_runs", "n_passed", "pass_rate", "total_violations",
        "total_rows", "latest_run", "latest_violation_rate",
        "prior_violation_rate", "anomaly")
      .as[(String, Long, Long, Double, Long, Long, String, Double, Double, Boolean)]
      .head()
    assert(t == (("x_nonneg", 4L, 3L, 0.75, 2L, 11L, "r4", 0.5, 0.0, true)), t)

    // no-anomaly shape: steady small violation rate does not flag
    Quality.persistVerdicts(store, "r5",
      suite(Seq((1L, -1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))))
    val t2 = Quality.trend(Quality.readVerdicts(spark, store))
      .select("latest_run", "latest_violation_rate", "prior_violation_rate", "anomaly")
      .as[(String, Double, Double, Boolean)].head()
    // latest 1/4 = 0.25 vs prior 2/11 ≈ 0.1818: elevated but < 2× — quiet
    assert(t2._1 == "r5" && t2._2 == 0.25 && !t2._4, t2)
  }

  test("driftPsiTabular: identical cohorts read ~0; a shifted cohort moves mass and psi") {
    // cohort a: values 5,15,25 (bins 0,1,2); cohort b identical -> every
    // term 0, psi 0; then b shifted to bins 7,8,9 -> psi > 1 (a real shift)
    val same = Seq(("a", 5.0), ("a", 15.0), ("a", 25.0),
      ("b", 5.0), ("b", 15.0), ("b", 25.0)).toDF("grp0", "v")
    val r0 = Quality.driftPsiTabular(same, "v", col("grp0"), binWidth = 10.0)
      .select("psi").as[Double].head()
    assert(r0 == 0.0, s"identical cohorts: $r0")
    // larger cohorts (Laplace +1 damps tiny samples): a in bins 0-2,
    // b fully shifted to bins 7-9, 10 values per bin
    val shifted = (for (b <- 0 to 2; i <- 0 until 10)
      yield ("a", b * 10.0 + 5.0)) ++
      (for (b <- 7 to 9; i <- 0 until 10) yield ("b", b * 10.0 + 5.0))
    val r1 = Quality.driftPsiTabular(shifted.toDF("grp0", "v"), "v",
      col("grp0"), binWidth = 10.0)
      .select("bin", "n_a", "n_b", "psi")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r1.length == 10)
    assert(r1.head._4 > 2.0, s"shifted psi: ${r1.head._4}")
    assert(r1.map(_._2).sum == 30 && r1.map(_._3).sum == 30)
    // rows outside both cohorts are excluded, overflow bin caps
    val capped = Seq(("a", 5.0), ("b", 1e9), ("zz", 5.0)).toDF("grp0", "v")
    val r2 = Quality.driftPsiTabular(capped, "v",
      when(col("grp0") === "a", "a").when(col("grp0") === "b", "b"),
      binWidth = 10.0)
      .select("bin", "n_b").as[(Long, Long)].collect().toMap
    assert(r2(9L) == 1L, "1e9 lands in the capped overflow bin")
  }

  test("benford: digit from the decimal rendering, zero/null excluded, literal expectations") {
    // first SIGNIFICANT digit: 1.0/12.5/0.13 → '1', 9.5 → '9';
    // 0.0 renders '0.00' (no [1-9]) and NULL is filtered — n_total = 4
    val df = Seq(Some(1.0), Some(12.5), Some(0.13), Some(9.5), Some(0.0),
        Option.empty[Double])
      .toDF("v")
    val got = Quality.benford(df, "v")
      .select("digit", "n", "share", "expected", "dev")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("1", "9"))
    assert(got("1")._2 == 3L && got("1")._3 == 0.75)
    assert(got("9")._2 == 1L && got("9")._3 == 0.25)
    val e1 = math.log10(2.0)
    assert(got("1")._4 == e1)
    assert(got("1")._5 == (0.75 - e1) * (0.75 - e1) / e1)
    assert(Quality.benfordShares.map(_._2).sum > 0.999) // shares form a distribution
  }

  private implicit class MapOps(rows: Array[(String, Long, Long, Boolean)]) {
    def toMap2: Map[String, (Long, Long, Boolean)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
