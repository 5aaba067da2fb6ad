package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamIngest
import graft.tsdb.TsOps
import org.apache.spark.sql.functions._

/** Online CUSUM (flatMapGroupsWithState, O(1) state) converges to the
  * batch closed form EXACTLY when fed the batch's own baseline
  * moments — integer 1e-6 units on both sides make "exactly" literal:
  * same crossings, same timestamps, same stat values, across
  * micro-batch cuts and within-batch disorder. */
class StreamCusumSpec extends SparkSpec {
  import spark.implicits._

  test("streaming CUSUM == batch cusum given the batch's moments; state survives batch cuts") {
    // the TsOpsSpec shift series: 20 at 0.0 then 10 at 10.0
    val vals = Seq.fill(20)(0.0) ++ Seq.fill(10)(10.0)
    val mean = vals.sum / vals.size
    val std = math.sqrt(vals.map(v => v * v).sum / vals.size - mean * mean)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long, Double)]
    val samples = input.toDF().toDF("series_id", "ts_us", "event_id", "value")
    val q = StreamIngest.cusumStream(samples, mean, std).writeStream
      .format("memory").queryName("cusum_stream").outputMode("append").start()

    val rows = vals.zipWithIndex.map { case (v, i) => ("s1", i.toLong * 1000000L, i.toLong, v) }
    // three micro-batches, the first one internally out of order —
    // the down-crossing at sample 6 must survive the 5/15 cuts
    input.addData(rows.take(5).reverse: _*); q.processAllAvailable()
    input.addData(rows.slice(5, 15): _*); q.processAllAvailable()
    input.addData(rows.drop(15): _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cusum_stream")
      .select("ts_us", "direction", "stat")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq

    val batch = TsOps.cusum(rows.toDF("series_id", "ts_us", "event_id", "value"))
      .select("ts_us", "direction", "stat")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq

    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(streamed.map(r => (r._1, r._2)) ==
      Seq((6000000L, "down"), (22000000L, "up")))
  }
}
