package graft.tsdb

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series join Spark
  * has no operator for (pandas merge_asof / kdb aj / QuestDB ASOF).
  *
  * Implemented by composition (the preferred extension level: no
  * custom physical operator needed): tag both inputs, union, and take
  * `last(value, ignoreNulls)` over a (keys × time)-ordered window.
  * Right rows sort before left rows at equal timestamps, so the match
  * is inclusive (right.ts <= left.ts).
  *
  * Scale shape: ONE shuffle + sort of |L|+|R| rows by key — the same
  * cost as a sort-merge join, with no range-condition blowup (a naive
  * `r.ts <= l.ts` theta-join is quadratic per key). State per window
  * is one value per right column — constant memory.
  *
  * Determinism: callers must ensure the right side has at most one row
  * per (keys, ts) — [[latestPerTs]] does that — otherwise *any* engine
  * (DuckDB's native ASOF included) picks among ties arbitrarily.
  */
object AsOf {

  /** Dedupe right side to the single latest row per (keys, ts),
    * breaking ties by largest `idCol`. */
  def latestPerTs(right: DataFrame, keys: Seq[String], tsCol: String,
                  idCol: String, valCol: String): DataFrame =
    right
      .groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(struct(col(idCol), col(valCol))).as("__m"))
      .select((keys :+ tsCol).map(col) :+ col(s"__m.$valCol").as(valCol): _*)

  /** For each left row: all left columns + `valCol` from the latest
    * right row with right.ts <= left.ts (null if none). */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valCol: String, asCol: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val l = left.select(
      (keys :+ tsCol).map(col) ++
        Seq(lit(1).as("__side"), lit(null).cast(right.schema(valCol).dataType).as("__rv")) ++
        leftPayload.map(col): _*)
    val r = right.select(
      (keys :+ tsCol).map(col) ++
        Seq(lit(0).as("__side"), col(valCol).as("__rv")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__rv")
  }
}
