package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamIngest

class StreamKmvSpec extends SparkSpec {
  import spark.implicits._

  test("streaming KMV sketch converges to the batch estimator") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("event_type", "user_id")

    val q = StreamIngest.kmvDistinctStream(events, k = 16).writeStream
      .format("memory")
      .queryName("kmv_stream")
      .outputMode("update")
      .start()

    // two batches, overlapping users, order scrambled across batches
    input.addData((0 until 300).map(i => ("click", (i * 7 % 100).toLong)): _*)
    q.processAllAvailable()
    input.addData((0 until 300).map(i => ("click", (i * 13 % 150).toLong)) ++
      Seq.tabulate(5)(i => ("view", i.toLong)): _*)
    q.processAllAvailable()
    q.stop()

    // latest update per group = converged state
    val streamed = spark.table("kmv_stream")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy(col("n_kept").desc, col("kth_hash"))))
      .filter(col("rn") === 1)
      .select(col("g"), col("n_kept"), col("kth_hash"), col("est_distinct"))

    val batch = graft.analytics.Kmv.distinctEstimate(
      ((0 until 300).map(i => ("click", (i * 7 % 100).toLong)) ++
        (0 until 300).map(i => ("click", (i * 13 % 150).toLong)) ++
        Seq.tabulate(5)(i => ("view", i.toLong))).toDF("event_type", "user_id"),
      col("event_type"), col("user_id"), k = 16)

    val s = streamed.as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val b = batch.as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(s == b, s"streamed $s != batch $b")
    // "view" exercises the under-k exact path; "click" the estimator path
    assert(s.find(_._1 == "view").get._4 == 5.0)
    assert(s.find(_._1 == "click").get._2 == 16L)
  }
}
