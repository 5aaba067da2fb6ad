package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation over similarity-pair graphs — the one
  * compute class the rest of the engine's dedup stack doesn't
  * exercise (connected components label-propagate to a FIXPOINT of
  * mins; PageRank iterates a weighted AVERAGE, so every iteration's
  * numeric value matters).
  *
  * Determinism is the design constraint: a float PageRank sums
  * neighbor contributions in partition order, and eight iterations
  * amplify the reassociation drift past any rounding fence. This
  * implementation runs ENTIRELY in integer nano-units (rank 1.0 ≡
  * 10^9) with floor division — contribution = r div deg, damping =
  * (85·Σ) div 100 — so every iteration is bit-exact under any
  * partitioning, any engine, any summation order. The floor bias
  * loses < 1 nano per division: invisible at report precision,
  * priceless for reproducible pipelines. */
object Graph {

  /** PageRank over an UNDIRECTED pair graph (each pair conducts rank
    * both ways), damping 0.85, fixed `iters` sweeps.
    *
    * Scale shape (100 TB): edges build once — symmetrize + one degree
    * aggregation — and persist for all iterations; each sweep is ONE
    * shuffle join of ranks onto edges by src plus ONE aggregation by
    * dst (both hash-partitioned on node id; on a real cluster the two
    * frames co-partition and the join side of later sweeps reuses the
    * exchange). Ranks persist per sweep to cut the lineage chain —
    * the frame is nodes-sized, orders smaller than the corpus. The
    * only driver action is the node COUNT (one scalar, needed inside
    * the integer base term). */
  def pagerank(pairs: DataFrame, iters: Int = 8): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters in [1, 50]")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // deg is nodes-sized: checkpoint it eagerly so the init ranks,
    // the per-sweep join input AND the final report all read the same
    // materialized blocks instead of re-running the pair pipeline
    // (blocks are reclaimed by the ContextCleaner once unreferenced).
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val e = edges.join(deg, "src").persist()
    val n = e.select(col("src")).distinct().count()
    require(n > 0, "empty pair graph")
    val base = 150000000L / n        // (1−d)/N in nano-units, floored
    val init = 1000000000L / n       // 1/N in nano-units, floored
    // localCheckpoint, not persist: a persisted frame KEEPS its logical
    // lineage, so the plan tree doubles per sweep and Catalyst
    // re-analysis goes exponential (measured: 2.7s at 2 sweeps, 74s at
    // 8). Checkpointing truncates the plan to the materialized blocks —
    // analysis stays O(1) per sweep and 8 sweeps run in ~1s.
    var ranks = deg.select(col("src").as("node"), lit(init).as("r"))
      .localCheckpoint()
    for (i <- 1 to iters) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node"))
        .agg((lit(base) + expr("(85 * sum(c)) div 100")).as("r"))
      // checkpoint every SECOND sweep: a depth-2 plan re-analyzes fine
      // (the exponential blowup needed the full per-sweep doubling),
      // and half the eager materialization jobs come off the wall
      // (r12 optimization; integer arithmetic — results bit-identical)
      if (i % 2 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    // every sweep ran eagerly above (localCheckpoint), so the edge
    // cache has done its work; release it — the returned frame reads
    // only the checkpointed ranks + deg blocks, so a long-lived
    // session doesn't accumulate a dead edge cache per call
    e.unpersist(false)
    ranks.join(deg.withColumnRenamed("src", "node"), "node")
      .select(col("node").as("doc_id"), col("deg"),
        col("r").as("rank_nano"),
        (col("r") / lit(1000000000.0)).as("rank"))
  }

  /** TRIANGLE COUNT + local clustering coefficient per node over an
    * undirected edge frame `(u, v)` — the cohesion read on a graph
    * (a node whose neighbors all know each other is inside a
    * community; a hub bridging strangers reads ≈ 0). Triangles
    * enumerate once each as ordered triples a<b<c via two hash
    * equi-joins on the canonicalized (u<v, distinct) edge set — the
    * standard distributed shape; no node ever compares against the
    * whole graph. Per-node participation = the triple unioned out to
    * its three corners; clustering = 2T / (d(d−1)) as ONE raw double
    * division of exact integers (§4), NULL at degree < 2 (honest,
    * never 0-by-convention). Scale: everything is edge-frame-sized;
    * the a<b<c ordering keeps the join fan-out to each triangle
    * exactly once. */
  def clustering(edges: DataFrame): DataFrame = {
    val und = edges
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .distinct()
      .persist()
    val tri = und.as("e1")
      .join(und.as("e2"), col("e2.u") === col("e1.v"))
      .join(und.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val perNode = tri.select(col("a").as("node"))
      .unionByName(tri.select(col("b").as("node")))
      .unionByName(tri.select(col("c").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val deg = und.select(col("u").as("node"))
      .unionByName(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("n_triangles"), lit(0L))
            / (col("degree") * (col("degree") - 1)))
          .as("clustering"))
  }
}
