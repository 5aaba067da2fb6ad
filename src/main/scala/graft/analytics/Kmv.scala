package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the cardinality
  * estimator for when an exact `count(DISTINCT x)` shuffle of every
  * distinct value is too expensive but the answer must still be
  * DETERMINISTIC and engine-portable (HLL implementations differ
  * engine-to-engine; the k smallest md5 values of a column do not,
  * so the oracle can restate the whole estimator bit-for-bit).
  *
  * Estimator (Bar-Yossef et al., RANDOM'02): with U(k) = the k-th
  * smallest hash as a fraction of the hash space, DV ≈ (k−1)/U(k).
  * Hashes are the md5-prefix hash60 idiom (uniform on [0, 2^60)).
  *
  * Plan shape at 100 TB: one partial-aggregated DISTINCT of
  * (group, hash60) — map-side combine collapses repeats before the
  * shuffle — then the custom bounded-heap TopKPerKey keeps the k
  * smallest per group (≤k rows per group per map partition cross the
  * second, tiny shuffle), then a k-row-per-group final aggregate.
  * Never a full sort, never an unbounded collect; heap memory is
  * O(groups-per-partition × k).
  */
object Kmv {
  val HashSpace: Double = 1152921504606846976.0d // 2^60

  def hash60(c: Column): Column =
    graft.functions.Md5Prefix(c, 15)

  /** KMV SET ALGEBRA over two labeled sets — the reason mergeable
    * sketches exist: estimate |A∪B| and |A∩B| from the two k-min
    * sketches WITHOUT touching the raw sets again. Union sketch = the
    * k smallest of the merged min-lists (the exact semilattice merge
    * the streaming KMV already relies on); intersection = the
    * Beyer et al. (SIGMOD'07) estimator ρ̂·D̂(A∪B) where ρ̂ counts how
    * many of the union sketch's k minima are members of BOTH input
    * sketches. Exact counts ride along as the error evidence.
    *
    * Scale: the raw sets reduce to ≤k rows each (TopKPerKey bounded
    * heaps after a partial-aggregated distinct); everything after is
    * arithmetic on ≤2k rows. Deterministic end to end (md5 hashes,
    * integer comparisons, one raw-IEEE division per estimate).
    * Input: two-set frame via `setLabel` ∈ {a, b}. One output row. */
  def setOpsEstimate(df: DataFrame, setLabel: Column, value: Column,
                     k: Int): DataFrame = {
    val hashed = df.select(setLabel.as("g"), hash60(value).as("h")).distinct()
    // deliberately UNPAIRED persist: the ≤2k-row min-lists feed two
    // lazy branches of the returned frame (no unpersist point) and are
    // session-shared via CacheManager subtree match (the rfm/ppl_bucket idiom: a repeated call or a sibling query with the canonically-identical subtree REUSES this entry — no accumulation; Bench clears per family, long sessions clearCache at job boundaries)
    val mins = graft.plans.TopKPerKey(hashed, Seq("g"),
      Seq("h" -> graft.plans.TopKPerKey.Asc), k).persist()
    def est(kth: Column, n: Column): Column =
      when(n < k, n.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / kth.cast("double"))
    val perSet = mins.groupBy(col("g"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
      .select(col("g"), col("n_kept"), est(col("kth"), col("n_kept")).as("e"))
    // Conditional aggregation to ONE row (never a filter → crossJoin
    // of a possibly-EMPTY side): a missing set label must report
    // est 0.0, not silently erase the whole report.
    val estRow = perSet.agg(
      coalesce(max(when(col("g") === "a", col("e"))), lit(0.0)).as("est_a"),
      coalesce(max(when(col("g") === "b", col("e"))), lit(0.0)).as("est_b"))
    // union sketch: k smallest distinct hashes of the merged min-lists,
    // each tagged with which input sketches contain it
    val tagged = mins.groupBy(col("h"))
      .agg(max(when(col("g") === "a", 1).otherwise(0)).as("in_a"),
        max(when(col("g") === "b", 1).otherwise(0)).as("in_b"))
    val uk = graft.plans.TopKPerKey(tagged.withColumn("one", lit(1)), Seq("one"),
      Seq("h" -> graft.plans.TopKPerKey.Asc), k)
    val uAgg = uk.agg(
      count(lit(1)).as("u_kept"), max(col("h")).as("u_kth"),
      sum(col("in_a") * col("in_b")).as("n_both"))
      .select(est(col("u_kth"), col("u_kept")).as("est_union"),
        coalesce(col("n_both").cast("double") / col("u_kept").cast("double"),
          lit(0.0)).as("jaccard_est"))
      .select(col("est_union"), col("jaccard_est"),
        (col("jaccard_est") * col("est_union")).as("est_intersection"))
    // exact truth for the error columns: one pass over distinct values
    val exact = df.select(setLabel.as("g"), value.as("v")).distinct()
      .groupBy(col("v"))
      .agg(max(when(col("g") === "a", 1).otherwise(0)).as("ia"),
        max(when(col("g") === "b", 1).otherwise(0)).as("ib"))
      .agg(sum(col("ia")).as("n_a_exact"), sum(col("ib")).as("n_b_exact"),
        count(lit(1)).as("n_union_exact"),
        sum(col("ia") * col("ib")).as("n_inter_exact"))
    exact.crossJoin(broadcast(estRow))
      .crossJoin(broadcast(uAgg))
      .select(col("n_a_exact"), col("n_b_exact"), col("n_union_exact"),
        col("n_inter_exact"), col("est_a"), col("est_b"),
        col("est_union"), col("est_intersection"), col("jaccard_est"))
  }

  /** Per-`group` distinct-count estimate of `value` with a k-minimum
    * sketch. Output: (group, n_kept, kth_hash, est_distinct) — groups
    * with fewer than k distinct values report their exact count. */
  def distinctEstimate(df: DataFrame, group: Column, value: Column, k: Int): DataFrame = {
    val hashed = df
      .select(group.as("g"), hash60(value).as("h"))
      .distinct() // partial-aggregated: repeats die map-side
    graft.plans.TopKPerKey(hashed, Seq("g"),
      Seq("h" -> graft.plans.TopKPerKey.Asc), k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
      .select(
        col("g"), col("n_kept"), col("kth_hash"),
        // UNROUNDED: (k−1)·2^60 is an exact double, the division is
        // identical IEEE arithmetic on any engine — rounding a
        // full-precision quotient would ADD cross-engine drift
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) / col("kth_hash").cast("double"))
          .as("est_distinct"))
  }
}
