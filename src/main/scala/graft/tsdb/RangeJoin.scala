package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join: points ⋈ intervals by containment
  * (`start ≤ ts ≤ end`), optionally under shared equi-keys.
  *
  * A containment predicate alone gives Spark no equi-condition, so the
  * naive plan is a BroadcastNestedLoopJoin — O(points × intervals),
  * dead at any real scale. The scale shape: quantize time into chunks,
  * explode each interval to the chunks it covers (bounded map-side
  * fan-out of ⌈len/chunk⌉ rows per interval), and equi-join on
  * (keys…, chunk) — a plain hash join — then filter exact containment.
  * A point's interval matches always share the point's chunk, so the
  * equi-join loses nothing. `chunkUs` dials fan-out vs join
  * selectivity: set it near the typical interval length (the same
  * trade Flink's interval join and Databricks' range-join binning
  * make; here it also lines up with the ChunkStore's partition grain,
  * so at rest the join prunes to co-located chunk partitions).
  */
object RangeJoin {

  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        keys: Seq[String] = Nil,
                        tsCol: String = "ts_us",
                        startCol: String = "start_us", endCol: String = "end_us",
                        chunkUs: Long = 3600L * 1000000): DataFrame = {
    require(chunkUs > 0, "chunkUs must be positive")
    val pts = points.withColumn("__chunk", expr(s"$tsCol div $chunkUs"))
    val ivs = intervals.withColumn("__chunk",
      explode(sequence(expr(s"$startCol div $chunkUs"), expr(s"$endCol div $chunkUs"))))
    pts.join(ivs, keys :+ "__chunk")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__chunk")
  }
}
