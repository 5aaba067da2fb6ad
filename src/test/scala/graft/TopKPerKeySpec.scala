package graft

import graft.plans.TopKPerKey
import graft.plans.TopKPerKey.{Asc, Desc}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("matches the window row_number idiom on real data") {
    val c = spark.read.parquet(s"$sfDir/customer.parquet")
    val viaOp = TopKPerKey(c, Seq("c_mktsegment"), Seq("c_acctbal" -> Desc, "c_custkey" -> Asc), 3)
      .select("c_mktsegment", "c_custkey").as[(String, Long)].collect().toSet
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal".desc, $"c_custkey".asc)
    val viaWindow = c.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select("c_mktsegment", "c_custkey").as[(String, Long)].collect().toSet
    assert(viaOp == viaWindow)
    assert(viaOp.size == 15)
  }

  test("keys with fewer than k rows keep all rows") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val r = TopKPerKey(df, Seq("k"), Seq(("v", Desc)), 10)
      .as[(String, Int)].collect().toSet
    assert(r == Set(("a", 1), ("a", 2), ("b", 5)))
  }

  test("two-phase plan: partial + exchange + final") {
    val df = spark.read.parquet(s"$sfDir/customer.parquet")
    val q = TopKPerKey(df, Seq("c_mktsegment"), Seq(("c_acctbal", Desc)), 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(600))
    assert("TopKPerKey \\[".r.findAllIn(plan).size >= 2, plan.take(600))
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage"), plan.take(600))
  }

  test("survives downstream transforms (filter/select on top)") {
    val df = Seq(("a", 1, "x"), ("a", 3, "y"), ("a", 2, "z"), ("b", 9, "w"))
      .toDF("k", "v", "p")
    val r = TopKPerKey(df, Seq("k"), Seq(("v", Desc)), 2)
      .filter($"k" === "a").select("p").as[String].collect().toSet
    assert(r == Set("y", "z"))
  }
}
