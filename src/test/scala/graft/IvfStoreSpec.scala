package graft

import graft.vector.{IvfStore, VectorOps}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IvfStoreSpec extends SparkSpec {
  import spark.implicits._

  test("cell-partitioned index: probe prunes partitions and matches in-memory IVF") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val dir = Files.createTempDirectory("graft_ivf").toString
    val store = new IvfStore(spark, dir)
    store.write(e)

    // every cell is a partition directory
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .count(_.getName.startsWith("cell="))
    assert(cellDirs > 1 && cellDirs <= 16)

    val queries = e.filter($"vec_id" < 5)
    val got = store.probeTopK(queries, k = 10, nProbe = 4)
    got.count()

    // partition pruning visible in the probe plan: the scan carries a
    // PartitionFilters entry on cell, and only probed dirs are read
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))

    // identical answer to the in-memory IVF operator (same quantizer,
    // same probes, same rerank)
    val mem = VectorOps.ivfTopK(e, $"vec_id" < 5, k = 10)
    val a = got.select("q_id", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val b = mem.select("q_id", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(a == b)
  }
}
