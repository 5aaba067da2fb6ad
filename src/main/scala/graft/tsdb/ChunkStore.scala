package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-chunked sample storage — the reference's chunk lifecycle
  * (src/db.rs:100-110 chunk dirs, :265-303 swap, src/chunk/chunk.rs)
  * mapped to its Spark-native equivalent:
  *
  *  - a chunk = a parquet partition `chunk=<hour-bucket>`; the
  *    reference's range-overlap chunk pruning (db.rs:236
  *    `is_with_range`) becomes Catalyst partition pruning on the
  *    `chunk` directory column — metadata-only, scales to 100 TB;
  *  - "closing" a chunk (reference: compress on swap,
  *    src/chunk/chunk.rs `close`) = rewriting its rows as one
  *    Gorilla payload per series ([[Gorilla.pack]]).
  *
  * Appends are per-chunk parquet writes: on a cluster each micro-batch
  * lands in its hour partition and never rewrites history.
  */
final class ChunkStore(spark: SparkSession, path: String, chunkMs: Long = 3600000L) {
  private val chunkUs = chunkMs * 1000
  private val livePath = s"$path/live"
  private val closedPath = s"$path/closed"

  /** Append samples (from [[Series.samples]]), routed to their chunk. */
  def append(samples: DataFrame): Unit =
    samples
      .withColumn("chunk", expr(s"ts_us div $chunkUs"))
      .write.mode("append").partitionBy("chunk").parquet(livePath)

  def live(): DataFrame = spark.read.parquet(livePath)

  /** Matcher + range query over live chunks. The chunk bounds filter
    * is on the partition column → partition pruning (the reference's
    * `is_with_range` scan skip); the ts filter pushes into parquet. */
  def query(ms: Seq[Matcher], startUs: Long, endUs: Long): DataFrame =
    TsOps.rangeQuery(
      live().filter(col("chunk") >= startUs / chunkUs && col("chunk") <= endUs / chunkUs),
      ms, startUs, endUs)

  /** Close one chunk: Gorilla-pack its series into the closed store. */
  def closeChunk(chunk: Long): Unit =
    Gorilla.pack(live().filter(col("chunk") === chunk))
      .withColumn("chunk", lit(chunk))
      .write.mode("overwrite").partitionBy("chunk").parquet(closedPath)

  /** Read a closed chunk back as samples (decode + explode). */
  def readClosed(chunk: Long): DataFrame =
    Gorilla.unpack(spark.read.parquet(closedPath).filter(col("chunk") === chunk))
}
