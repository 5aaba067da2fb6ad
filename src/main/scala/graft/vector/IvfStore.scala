package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF index AT REST: the corpus written as parquet partitioned by its
  * IVF cell (`cell=<id>` directories) plus the centroid table. A
  * top-k probe then touches only the `nProbe` probed cells — Catalyst
  * partition pruning skips every other cell directory, so the scan
  * cost is nProbe/nCells of the corpus no matter how large the corpus
  * grows. This is the at-scale delivery of the IVF story: the cell id
  * is not just a join key, it is the physical layout.
  *
  * Probe plan (asserted in IvfStoreSpec):
  *   Scan parquet [PartitionFilters: cell IN (probed…)] → join(bcast
  *   probes) → cosine → per-query top-k.
  */
final class IvfStore(spark: SparkSession, path: String,
                     nCells: Int = 16, roundTo: Int = 6) {
  private val dataPath = s"$path/cells"
  private val centroidPath = s"$path/centroids"

  /** Build the index: assign cells, write cell-partitioned corpus and
    * the centroid table. `quantizer` swaps in a trained codebook
    * (e.g. [[VectorOps.kmeansCentroids]]); default is the
    * deterministic lowest-id stub. */
  def write(corpus: DataFrame, quantizer: Option[DataFrame] = None): Unit = {
    val cents = quantizer.getOrElse(VectorOps.ivfCentroids(corpus, nCells))
    cents.write.mode("overwrite").parquet(centroidPath)
    corpus
      .join(VectorOps.ivfAssign(corpus, cents, roundTo), "vec_id")
      .write.mode("overwrite").partitionBy("cell").parquet(dataPath)
  }

  /** Incremental ingest: assign a NEW vector batch to the EXISTING
    * centroids and append into the cell partitions — the index grows
    * without rebuilding or rescanning the corpus (the MinhashStore
    * discipline applied to ANN; only the batch is assigned/written).
    * The quantizer is FIXED at build time: appending never moves
    * centroids, so cell membership of already-indexed vectors — and
    * therefore their probe recall — is untouched; re-training the
    * codebook is a rebuild by policy, not a side effect of ingest.
    * Refuses to append before the index exists (there would be no
    * centroids to assign against — a silent fresh-train here would
    * create exactly the mixed-generation corruption the MinhashStore
    * guard exists for). */
  def append(newVectors: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(centroidPath)),
      s"IvfStore($path): no centroid table — build the index with write() " +
        "before appending (appending would otherwise train a fresh quantizer " +
        "whose cells are incompatible with the stored layout)")
    newVectors
      .join(VectorOps.ivfAssign(newVectors, centroids(), roundTo), "vec_id")
      .write.mode("append").partitionBy("cell").parquet(dataPath)
  }

  def centroids(): DataFrame =
    org.apache.spark.sql.functions.broadcast(spark.read.parquet(centroidPath))

  def read(): DataFrame =
    spark.read.parquet(dataPath).withColumn("cell", col("cell").cast("long"))

  /** ANN top-k for `queries` (vec_id, v): rank centroids per query,
    * then scan ONLY the probed cell partitions and rerank exactly. */
  def probeTopK(queries: DataFrame, k: Int = 10, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probes = VectorOps.ivfProbes(queries, centroids(), nProbe, roundTo)
    // partition-pruning filter: the probed cell set is small (≤ queries
    // × nProbe ids), collected and pushed as an IN-list on the
    // partition column so non-probed directories are never listed
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val scored = read()
      .filter(col("cell").isInCollection(probedCells))
      .join(probes, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        round(graft.functions.CosineSimilarity(col("v"), col("qv")), roundTo))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank").cast("long").as("rank"))
  }
}
