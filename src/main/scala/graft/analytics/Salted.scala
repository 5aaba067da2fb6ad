package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-defeating two-phase aggregation.
  *
  * A single hot key (the skewed user, the empty-string label, the
  * null-ish bucket) turns `groupBy(key)` into one straggler task at
  * cluster scale. Salting splits every key into `buckets` sub-keys for
  * the first (partial) aggregation, then combines partials in a second
  * pass whose cardinality is only O(distinct keys × buckets).
  *
  * Works for any algebraic aggregate list (sum/count/min/max —
  * anything where combine(partials) == total). The salt is a uniform
  * deterministic function of other columns, not rand(): deterministic
  * retries, deterministic results.
  */
object Salted {

  def withSalt(df: DataFrame, saltFrom: Column, buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(buckets)))

  /** Two-phase sum/count by `key`, salted on `saltFrom` (a column
    * whose values spread the hot key's rows, e.g. the event id). */
  def sumCountByKey(df: DataFrame, key: Column, value: Column, saltFrom: Column,
                    buckets: Int = 32): DataFrame =
    withSalt(df, saltFrom, buckets)
      .groupBy(key.as("k"), col("__salt"))
      .agg(
        sum(value.cast("decimal(28,6)")).as("psum"),
        count(lit(1)).as("pcnt"))
      .groupBy(col("k"))
      .agg(
        sum(col("psum")).cast("double").as("sum_value"),
        sum(col("pcnt")).as("n"))
}
