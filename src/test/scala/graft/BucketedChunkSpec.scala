package graft

import graft.tsdb._
import org.apache.spark.sql.functions._

class BucketedChunkSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-series layout: per-series agg plans with NO shuffle") {
    val samples = Series.samples(spark.read.parquet(s"$sfDir/events.parquet"))
    val t = new BucketedChunkTable(spark, "graft_bucketed_test")
    t.drop()
    t.write(samples, mode = "overwrite")
    try {
      val stats = t.seriesStats()
      val n = stats.count()
      assert(n > 0)
      // the whole point of the layout: scan's bucket distribution
      // satisfies the grouping, no Exchange anywhere in the plan
      val plan = stats.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
      // and the numbers agree with the unbucketed pipeline
      val expect = samples
        .withColumn("chunk", expr("ts_us div 3600000000"))
        .groupBy($"series_id", $"chunk").agg(count(lit(1)).as("n_points"))
        .agg(sum($"n_points"), count(lit(1))).as[(Long, Long)].head()
      val got = stats.agg(sum($"n_points"), count(lit(1))).as[(Long, Long)].head()
      assert(got == expect)
    } finally t.drop()
  }

  test("gorilla-packed closed table: lossless roundtrip, decoded per-series agg still shuffle-free") {
    val samples = Series.samples(spark.read.parquet(s"$sfDir/events.parquet"))
    val t = new BucketedChunkTable(spark, "graft_bucketed_closed_test")
    t.drop()
    t.writeClosed(samples, mode = "overwrite")
    try {
      val decoded = t.readClosed()
      // lossless: same multiset of (series_id, ts_us, value)
      val a = decoded.select("series_id", "ts_us", "value")
        .as[(String, Long, Double)].collect().sorted.toSeq
      val b = samples.select("series_id", "ts_us", "value")
        .as[(String, Long, Double)].collect().sorted.toSeq
      assert(a == b)
      // bucket distribution survives the decode explode: per-series agg
      // over DECODED samples plans with no Exchange
      val agg = decoded.groupBy($"series_id").agg(count(lit(1)).as("n"))
      agg.count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
    } finally t.drop()
  }

  test("same-bucketed tables join on series_id without shuffling either side") {
    val samples = Series.samples(spark.read.parquet(s"$sfDir/events.parquet"))
    val a = new BucketedChunkTable(spark, "graft_bucketed_a")
    val b = new BucketedChunkTable(spark, "graft_bucketed_b")
    a.drop(); b.drop()
    a.write(samples.filter($"event_type" === "click"), mode = "overwrite")
    b.write(samples.filter($"event_type" === "purchase"), mode = "overwrite")
    try {
      val j = a.read().groupBy("series_id").count()
        .join(b.read().groupBy("series_id").count(), "series_id")
      j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(800))
    } finally { a.drop(); b.drop() }
  }
}
