package graft

import graft.text.Dedup
import org.apache.spark.sql.functions.{countDistinct, max}

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chain A~B~C collapses to one cluster") {
    // B overlaps A and C, but A and C share little — transitivity
    // must still place all three in one component
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon omega"),  // ~doc 1
      (3L, "gamma delta epsilon omega psi chi"),     // ~doc 2, not doc 1
      (4L, "totally unrelated words appear here now"),
      (5L, "alpha beta gamma delta epsilon zeta"))   // == doc 1
      .toDF("doc_id", "text")
    // exact pair source: this test is about CC transitivity, so the
    // candidate generator must not miss edges (tiny 4-shingle docs are
    // exactly where LSH banding is allowed to drop a pair)
    val reps = Dedup.duplicateClusters(docs, 3, 0.2,
        pairSource = Some(Dedup.ngramJaccardPairs(docs, 3, 0.2)))
      .as[(Long, Long)].collect().toMap
    assert(reps(1L) == 1L && reps(2L) == 1L && reps(5L) == 1L)
    assert(reps(4L) == 4L)
    // doc 3 joins iff its jaccard link to 2 clears the threshold —
    // either way it must be self-rooted or rooted at 1, never at 2
    assert(reps(3L) == 1L || reps(3L) == 3L)
  }

  test("distributed pointer-jump path agrees with driver union-find") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon omega"),
      (3L, "gamma delta epsilon omega psi chi"),
      (4L, "totally unrelated words appear here now"),
      (5L, "alpha beta gamma delta epsilon zeta"),
      (6L, "totally unrelated words appear here too"))
      .toDF("doc_id", "text")
    val viaDriver = Dedup.duplicateClusters(docs, 3, 0.2)
      .as[(Long, Long)].collect().toMap
    val viaDistributed = Dedup.duplicateClusters(docs, 3, 0.2, driverEdgeLimit = 0L)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == viaDistributed)
  }

  test("leakage-safe split: near-duplicates always land in the same split") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val split = Dedup.leakageSafeSplit(docs)
    assert(split.count() == docs.count()) // every doc assigned
    // within a cluster there is exactly one split value — the whole point
    val perCluster = split.groupBy("cluster_rep")
      .agg(countDistinct($"split").as("n_splits"))
      .agg(max($"n_splits")).as[Long].head()
    assert(perCluster == 1L)
    // and the assignment actually uses more than one split bucket
    assert(split.select("split").distinct().count() >= 2)
  }

  test("matches the oracle's transitive-closure semantics on real docs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val clusters = Dedup.duplicateClusters(docs)
    assert(clusters.count() == docs.count()) // every doc labeled
    // a rep is always ≤ its member ids and is itself in the cluster
    val bad = clusters.filter($"cluster_rep" > $"doc_id").count()
    assert(bad == 0)
  }
}
