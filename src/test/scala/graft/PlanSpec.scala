package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the claims SURVEY §5 makes: filters reach
  * the parquet scan, projections prune the read schema, dimension
  * joins broadcast, hot aggregations stay in HashAggregate. These are
  * the properties that decide 100 TB behavior — asserting them keeps
  * refactors honest. */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q1_agg: shipdate filter pushes to the scan; read schema is pruned") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(1200))
    // 7 needed columns, not the 16-column lineitem schema
    assert(!p.contains("l_orderkey") && !p.contains("l_comment"), "read schema not pruned")
  }

  test("ts_query_eq: label EQ matcher pushes into the events scan") {
    val p = plan("ts_query_eq")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(event_type,purchase)"), p.take(1200))
  }

  test("q5_regional: dimension joins broadcast, fact side never broadcasts") {
    val p = plan("q5_regional")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the lineitem fact table must stream, not broadcast
    val bcastBlocks = p.split("BroadcastExchange")
    assert(!bcastBlocks.drop(1).exists(_.take(400).contains("lineitem")),
      "fact table ended up on a broadcast side")
  }

  test("q1_agg and downsample aggregate in HashAggregate, not SortAggregate") {
    assert(!plan("q1_agg").contains("SortAggregate"))
    assert(!plan("ts_downsample_1h").contains("SortAggregate"))
  }
}
