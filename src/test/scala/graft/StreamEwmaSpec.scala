package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamIngest
import graft.tsdb.TsOps

/** Online truncated EWMA (flatMapGroupsWithState, O(k) cents state)
  * converges to the batch emit-and-refold operator EXACTLY — integer
  * cents × integer weights with the one DECIMAL→double division make
  * "exactly" literal — across micro-batch cuts, within-batch
  * disorder, ramp-up (< k samples) and the full kernel. */
class StreamEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("streaming EWMA == batch ewma bit-for-bit across micro-batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    // odd-cent values exercise the HALF_UP quantization; 12 samples
    // cover ramp-up AND the saturated 8-term kernel; s2 stays inside
    // ramp-up entirely
    val vals = Seq(1.005, 2.0, -3.145, 4.5, 0.0, 7.77,
      10.004, 8.25, 6.125, 2.5, 11.0, 0.015)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("s1", i.toLong * 1000000L, i.toLong, v)
    } ++ vals.take(5).zipWithIndex.map { case (v, i) =>
      ("s2", i.toLong * 2000000L, (100 + i).toLong, v * 3)
    }

    val input = MemoryStream[(String, Long, Long, Double)]
    val samples = input.toDF().toDF("series_id", "ts_us", "event_id", "value")
    val q = StreamIngest.ewmaStream(samples, k).writeStream
      .format("memory").queryName("ewma_stream").outputMode("append").start()
    // three cuts, the first internally out of order; each series
    // still arrives ordered ACROSS cuts (the operator's contract)
    input.addData(rows.take(4).reverse: _*); q.processAllAvailable()
    input.addData(rows.slice(4, 10): _*); q.processAllAvailable()
    input.addData(rows.drop(10): _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ewma_stream")
      .select("series_id", "ts_us", "value", "ewma")
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val batch = TsOps.ewma(rows.toDF("series_id", "ts_us", "event_id", "value"), k)
      .select("series_id", "ts_us", "value", "ewma")
      .as[(String, Long, Double, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(streamed.nonEmpty && streamed == batch,
      s"stream $streamed != batch $batch")
  }
}
