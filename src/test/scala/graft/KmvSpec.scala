package graft

import org.apache.spark.sql.functions._
import graft.analytics.Kmv

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below k distinct values the estimate is exact") {
    val df = Seq.tabulate(200)(i => ("a", i % 7)).toDF("g", "v")
    val out = Kmv.distinctEstimate(df, col("g"), col("v"), k = 64)
      .select("g", "n_kept", "est_distinct")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("a", 7L, 7.0)))
  }

  test("estimate lands within 25% of truth at 4000 distinct, k=64") {
    val df = Seq.tabulate(8000)(i => ("g", i % 4000)).toDF("g", "v")
    val est = Kmv.distinctEstimate(df, col("g"), col("v"), k = 64)
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - 4000) / 4000 < 0.25, s"estimate $est too far from 4000")
  }

  test("estimate is deterministic across partitionings (sketch is order-free)") {
    val base = Seq.tabulate(5000)(i => ((i % 3).toString, i % 997)).toDF("g", "v")
    val a = Kmv.distinctEstimate(base.repartition(2), col("g"), col("v"), k = 32)
    val b = Kmv.distinctEstimate(base.repartition(17, col("v")), col("g"), col("v"), k = 32)
    assert(a.orderBy("g").collect().toSeq == b.orderBy("g").collect().toSeq)
  }
}
