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

  test("setOpsEstimate: sub-k sets report exact; estimates track truth above k") {
    // below k both sketches are complete: every estimate IS the truth
    val small = ((1 to 30).map(i => ("a", i)) ++ (21 to 50).map(i => ("b", i)))
      .toDF("g", "v")
    val r = Kmv.setOpsEstimate(small, col("g"), col("v"), k = 64)
      .select("n_a_exact", "n_b_exact", "n_union_exact", "n_inter_exact",
        "est_a", "est_b", "est_union", "est_intersection")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    assert((r._1, r._2, r._3, r._4) == ((30L, 30L, 50L, 10L)), r)
    assert(r._5 == 30.0 && r._6 == 30.0 && r._7 == 50.0, r)
    assert(r._8 == (10.0 / 50) * 50.0, r)
    // above k the estimates stay within a loose band of the truth
    val big = ((1 to 3000).map(i => ("a", i)) ++ (2001 to 5000).map(i => ("b", i)))
      .toDF("g", "v")
    val e = Kmv.setOpsEstimate(big, col("g"), col("v"), k = 64)
      .select("est_union", "est_intersection")
      .as[(Double, Double)].head()
    assert(math.abs(e._1 - 5000) / 5000 < 0.3, e)
    assert(e._2 > 200 && e._2 < 2500, s"intersection estimate wild: $e (true 1000)")
  }

  test("setOpsEstimate is deterministic across partitionings") {
    val base = ((1 to 500).map(i => ("a", i % 211)) ++ (1 to 500).map(i => ("b", i % 307)))
      .toDF("g", "v")
    val a = Kmv.setOpsEstimate(base.repartition(2), col("g"), col("v"), k = 32).collect().toSeq
    val b = Kmv.setOpsEstimate(base.repartition(13, col("v")), col("g"), col("v"), k = 32).collect().toSeq
    assert(a == b)
  }
}
