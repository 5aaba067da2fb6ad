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
