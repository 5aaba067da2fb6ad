package graft.tsdb

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ChunkStore v2 layout: chunk partitioning PLUS hash-bucketing by
  * series_id inside each chunk (`bucketBy` + `saveAsTable`, Spark's
  * durable bucketing metadata). Per-series operators then consume the
  * scan's existing hash distribution:
  *
  *  - `groupBy(series_id)` aggregations (downsample, rate, quantiles,
  *    Gorilla pack) plan with NO Exchange — on a 100 TB store the
  *    per-series pipeline becomes scan → agg, shuffle-free;
  *  - two tables bucketed the same way join on series_id without
  *    shuffling either side (bucket-aligned sort-merge);
  *  - `sortBy(series_id, ts_us)` pre-orders rows inside each bucket
  *    file, so per-series time scans are sequential reads.
  *
  * The reference's per-series storage locality (sled key = series id,
  * src/storage/sled_storage.rs) maps to exactly this: co-locate a
  * series' points so per-series work never crosses the wire.
  */
final class BucketedChunkTable(spark: SparkSession, table: String,
                               chunkMs: Long = 3600000L, nBuckets: Int = 8) {
  private val chunkUs = chunkMs * 1000

  /** (Re)write samples as the bucketed table. Bucket metadata lives in
    * the session catalog; `append` mode adds new chunk partitions. */
  def write(samples: DataFrame, mode: String = "append"): Unit =
    samples
      .withColumn("chunk", expr(s"ts_us div $chunkUs"))
      .write.mode(mode)
      .partitionBy("chunk")
      .bucketBy(nBuckets, "series_id")
      .sortBy("series_id", "ts_us")
      .format("parquet")
      .saveAsTable(table)

  def read(): DataFrame = spark.table(table)

  /** Per-series per-chunk stats off the bucketed layout — the scan's
    * bucket distribution satisfies the grouping, so the plan contains
    * no shuffle (asserted in BucketedChunkSpec). */
  def seriesStats(): DataFrame =
    read()
      .groupBy(col("series_id"), col("chunk"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts_us")).as("min_ts_us"),
        max(col("ts_us")).as("max_ts_us"),
        TsOps.exactSum(col("value"), 2).as("sum_value"))

  /** Closed-chunk variant of the layout: Gorilla-packed payloads (one
    * row per series per chunk) in the SAME chunk-partitioned,
    * series-bucketed shape — compressed AND per-series co-located at
    * rest. The pack's groupBy(series_id, chunk) is itself satisfied by
    * the write-side repartition, and on read the decode explode
    * (Generate) preserves the scan's bucket distribution, so
    * aggregating DECODED samples per series is still Exchange-free. */
  def writeClosed(samples: DataFrame, mode: String = "append"): Unit =
    Gorilla.packChunked(samples, chunkUs) // ONE pack shape for every closed store
      .write.mode(mode)
      .partitionBy("chunk")
      .bucketBy(nBuckets, "series_id")
      .sortBy("series_id")
      .format("parquet")
      .saveAsTable(s"${table}_closed")

  /** Decode the closed table back to (series_id, chunk, ts_us, value). */
  def readClosed(): DataFrame =
    spark.table(s"${table}_closed")
      .select(col("series_id"), col("chunk"),
        explode(Gorilla.decodeUdf(col("payload"))).as("p"))
      .select(col("series_id"), col("chunk"),
        col("p._1").as("ts_us"), col("p._2").as("value"))

  /** Drop both tables AND their warehouse locations. The location
    * delete matters after a killed writer: files land before the
    * catalog entry, and a later CREATE fails on LOCATION_ALREADY_EXISTS
    * even though DROP TABLE IF EXISTS was a no-op. */
  def drop(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"DROP TABLE IF EXISTS ${table}_closed")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val conf = spark.sparkContext.hadoopConfiguration
    for (t <- Seq(table, s"${table}_closed")) {
      val p = new org.apache.hadoop.fs.Path(s"$warehouse/$t")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }
}
