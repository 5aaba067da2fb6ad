package graft

import graft.analytics.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: a hub outranks its leaves; leaves tie exactly; mass conserves") {
    // star: 1 — {2,3,4,5,6}
    val pairs = (2L to 6L).map(l => (1L, l)).toDF("doc_a", "doc_b")
    val out = Graph.pagerank(pairs)
      .select("doc_id", "deg", "rank_nano").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val hub = out.head
    val leaves = out.tail
    assert(hub._1 == 1L && hub._2 == 5L)
    assert(leaves.forall(_._2 == 1L))
    assert(leaves.map(_._3).distinct.size == 1, s"leaves must tie exactly: $out")
    assert(hub._3 > 2 * leaves.head._3, s"hub must dominate: $out")
    // floor divisions only LOSE mass: total in (0.95, 1.0] of 1e9
    val mass = out.map(_._3).sum
    assert(mass <= 1000000000L && mass > 950000000L, mass)
  }

  test("pagerank: bit-identical under repartitioning (integer arithmetic has no order)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.pagerank(df).select("doc_id", "rank_nano")
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(pairs) == run(pairs.repartition(7)))
  }

  test("pagerank: disjoint symmetric pairs stay uniform") {
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val ranks = Graph.pagerank(pairs).select("rank_nano").as[Long].collect().toSeq
    assert(ranks.distinct.size == 1 && ranks.size == 4, ranks)
  }

  test("clustering: triangle reads 1.0, a star hub reads 0, direction/dup edges collapse") {
    import spark.implicits._
    // triangle a-b-c plus hub h with leaves x,y (no leaf-leaf edge);
    // edges arrive directed and duplicated — canonicalization dedups
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"),
      ("h", "x"), ("h", "y"), ("x", "h"))
      .toDF("u", "v")
    val got = graft.analytics.Graph.clustering(edges)
      .select("node", "degree", "n_triangles", "clustering")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    for (n <- Seq("a", "b", "c"))
      assert(got(n) == ((n, 2L, 1L, Some(1.0))), got(n))
    assert(got("h") == (("h", 2L, 0L, Some(0.0))))
    // degree-1 leaves: clustering undefined → NULL, never 0
    assert(got("x") == (("x", 1L, 0L, None)))
    assert(got("y") == (("y", 1L, 0L, None)))
  }
}
