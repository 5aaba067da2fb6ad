package graft

import graft.analytics.Scd
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def dim0 = Scd.scd2Init(Seq(
    (1L, 100.0, "A"), (2L, 200.0, "B"), (3L, 300.0, "C"))
    .toDF("k", "bal", "seg"))

  test("scd2Merge: change closes + reopens, no-op passes through, insert opens") {
    val batch = Seq(
      (1L, 150.0, "A"),   // changed
      (2L, 200.0, "B"),   // identical — must NOT churn a version
      (9L, 900.0, "Z"))   // new key
      .toDF("k", "bal", "seg")
    val out = Scd.scd2Merge(dim0, batch, "k", Seq("bal", "seg"), 1000L)
      .select("k", "bal", "seg", "valid_from", "valid_to", "is_current")
      .as[(Long, Double, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._4)).toSeq
    assert(out == Seq(
      (1L, 100.0, "A", 0L, Some(1000L), false),
      (1L, 150.0, "A", 1000L, None, true),
      (2L, 200.0, "B", 0L, None, true),
      (3L, 300.0, "C", 0L, None, true),
      (9L, 900.0, "Z", 1000L, None, true)), out)
  }

  test("scd2Merge: sequential batches accumulate a version chain; history never rejoins") {
    val m1 = Scd.scd2Merge(dim0, Seq((1L, 150.0, "A")).toDF("k", "bal", "seg"),
      "k", Seq("bal", "seg"), 1000L)
    val m2 = Scd.scd2Merge(m1, Seq((1L, 175.0, "D"), (3L, 300.0, "C"))
      .toDF("k", "bal", "seg"), "k", Seq("bal", "seg"), 2000L)
    val k1 = m2.filter(col("k") === 1L)
      .select("bal", "seg", "valid_from", "valid_to", "is_current")
      .as[(Double, String, Long, Option[Long], Boolean)]
      .collect().sortBy(_._3).toSeq
    assert(k1 == Seq(
      (100.0, "A", 0L, Some(1000L), false),
      (150.0, "A", 1000L, Some(2000L), false),
      (175.0, "D", 2000L, None, true)), k1)
    // intervals tile [0, ∞) with no gap or overlap — as-of joins rely on it
    k1.sliding(2).foreach { case Seq(a, b) => assert(a._4.contains(b._3)) }
    assert(m2.filter(col("k") === 3L).count() == 1)
  }

  test("cdcApply: last op wins, deletes drop, inserts land, absent-key deletes are no-ops") {
    val base = Seq((1L, 100.0), (2L, 200.0), (3L, 300.0)).toDF("k", "bal")
    val ops = Seq(
      (1L, "U", 10L, Some(110.0)),
      (1L, "U", 20L, Some(120.0)),   // later — must win
      (2L, "D", 15L, None),          // delete
      (9L, "I", 12L, Some(900.0)),   // insert
      (7L, "D", 11L, None))          // delete of an absent key: no-op
      .toDF("k", "op", "ts_us", "bal")
    val out = graft.analytics.Scd.cdcApply(base, ops, "k", Seq("bal"))
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 120.0), (3L, 300.0), (9L, 900.0)), out)
  }

  test("cdcApply: delete-then-reinsert resolves by recency") {
    val base = Seq((1L, 1.0)).toDF("k", "bal")
    val ops = Seq((1L, "D", 10L, Option.empty[Double]),
      (1L, "I", 20L, Some(5.0))).toDF("k", "op", "ts_us", "bal")
    val out = graft.analytics.Scd.cdcApply(base, ops, "k", Seq("bal"))
      .as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 5.0)), out)
    val ops2 = Seq((1L, "I", 10L, Some(5.0)),
      (1L, "D", 20L, Option.empty[Double])).toDF("k", "op", "ts_us", "bal")
    val out2 = graft.analytics.Scd.cdcApply(base, ops2, "k", Seq("bal")).count()
    assert(out2 == 0L)
  }

  test("scd2Merge: nulls in tracked attrs compare null-safely") {
    val d = Scd.scd2Init(Seq((1L, Option.empty[Double], "A")).toDF("k", "bal", "seg"))
    val noop = Scd.scd2Merge(d, Seq((1L, Option.empty[Double], "A")).toDF("k", "bal", "seg"),
      "k", Seq("bal", "seg"), 1000L)
    assert(noop.count() == 1, "null == null must be a no-op, not a version churn")
    val changed = Scd.scd2Merge(d, Seq((1L, Some(5.0), "A")).toDF("k", "bal", "seg"),
      "k", Seq("bal", "seg"), 1000L)
    assert(changed.count() == 2, "null → value must version")
  }
}
