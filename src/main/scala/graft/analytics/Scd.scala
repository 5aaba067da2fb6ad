package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE 2 merge — the warehouse verb that
  * keeps dimension HISTORY when an update batch lands: a changed row
  * closes the current version (valid_to = batch time) and opens a new
  * one; an identical row passes through untouched; an unseen key
  * inserts. The event-sourcing half of the engine's batch surface —
  * joins against a time axis then use valid_from/valid_to interval
  * containment (the RangeJoin/AsOf operators this library already
  * ships).
  *
  * Scale shape: ONE full-outer shuffle join of the CURRENT slice
  * against the batch on the business key (both sides hash-partition
  * on it; a bucketed-by-key dimension at rest makes the stored side
  * shuffle-free), history rows pass through without touching the
  * join, and change detection is a null-safe column compare — no
  * window, no sort, no per-key state. The output is a plain frame:
  * writers can dynamic-partition-overwrite only the partitions the
  * batch touched. */
object Scd {

  /** Merge `updates` (key + tracked attrs) into the SCD2 `dim`
    * (key + attrs + valid_from, valid_to, is_current) at batch time
    * `tsUs`. Pre-existing history rows (is_current = false) pass
    * through. A key appearing multiple times in one batch is the
    * caller's bug — dedupe upstream (enforced nowhere here: the merge
    * is a pure frame transform). */
  def scd2Merge(dim: DataFrame, updates: DataFrame, key: String,
                attrs: Seq[String], tsUs: Long): DataFrame = {
    require(attrs.nonEmpty, "track at least one attribute")
    val hist = dim.filter(!col("is_current"))
    val cur = dim.filter(col("is_current"))
    val u = updates.select(col(key).as("__uk"),
      struct(attrs.map(col): _*).as("__uattrs"))
    val c = cur.select(col(key).as("__ck"),
      struct(attrs.map(col): _*).as("__cattrs"), col("valid_from"))
    val j = c.join(u, col("__ck") === col("__uk"), "full_outer")
    val changed = col("__ck").isNotNull && col("__uk").isNotNull &&
      !(col("__cattrs") <=> col("__uattrs"))
    val keep = j.filter(col("__ck").isNotNull &&
        (col("__uk").isNull || (col("__cattrs") <=> col("__uattrs"))))
      .select(Seq(col("__ck").as(key)) ++
        attrs.map(a => col(s"__cattrs.$a").as(a)) ++
        Seq(col("valid_from"), lit(null).cast("long").as("valid_to"),
          lit(true).as("is_current")): _*)
    val closed = j.filter(changed)
      .select(Seq(col("__ck").as(key)) ++
        attrs.map(a => col(s"__cattrs.$a").as(a)) ++
        Seq(col("valid_from"), lit(tsUs).as("valid_to"),
          lit(false).as("is_current")): _*)
    val opened = j.filter(col("__uk").isNotNull &&
        (col("__ck").isNull || changed))
      .select(Seq(col("__uk").as(key)) ++
        attrs.map(a => col(s"__uattrs.$a").as(a)) ++
        Seq(lit(tsUs).as("valid_from"), lit(null).cast("long").as("valid_to"),
          lit(true).as("is_current")): _*)
    val cols = Seq(key) ++ attrs ++ Seq("valid_from", "valid_to", "is_current")
    hist.select(cols.map(col): _*)
      .unionByName(keep).unionByName(closed).unionByName(opened)
  }

  /** CDC APPLY — collapse an insert/update/delete operations log onto
    * a base table: per key the LATEST op wins ('D' removes the row,
    * 'I'/'U' upsert the payload), untouched keys pass through. The
    * replication-consumer verb (Debezium/binlog apply) next to
    * [[scd2Merge]]'s history-keeping one.
    *
    * The per-key reduction is ONE hash aggregation via struct-max
    * (ts leads the struct, so the comparison IS the recency order —
    * no window, no sort, map-side partials); the apply is one
    * full-outer key join. Same bucketed-at-rest co-location story as
    * the SCD2 merge. Ties on (key, ts) resolve deterministically by
    * the struct's remaining fields — give ops unique timestamps per
    * key if you need semantic (not just stable) resolution. */
  def cdcApply(base: DataFrame, ops: DataFrame, key: String,
               attrs: Seq[String], opCol: String = "op",
               tsCol: String = "ts_us"): DataFrame = {
    require(attrs.nonEmpty, "carry at least one attribute")
    val last = ops.groupBy(col(key))
      .agg(max(struct((Seq(tsCol, opCol) ++ attrs).map(col): _*)).as("__l"))
      .select(col(key) +: col(s"__l.$opCol").as("__op") +:
        attrs.map(a => col(s"__l.$a").as(s"__$a")): _*)
    base.join(last, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: attrs.map(a =>
        when(col("__op").isNotNull, col(s"__$a")).otherwise(col(a)).as(a)): _*)
  }

  /** Bootstrap a plain dimension frame into SCD2 shape (one current
    * version per row, open-ended validity from `fromUs`). */
  def scd2Init(dim: DataFrame, fromUs: Long = 0L): DataFrame =
    dim.withColumn("valid_from", lit(fromUs))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
}
