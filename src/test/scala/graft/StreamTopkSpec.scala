package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamIngest

class StreamTopkSpec extends SparkSpec {
  import spark.implicits._

  // full event schema; ts carries ns so Series.tsUs normalizes it
  private def ev(id: Long, hour: Long, tpe: String): (Long, Long, Long, String, Double) =
    (id, hour * 3600000000L * 1000L, 1L, tpe, 1.0)

  /** The memory sink in update mode accumulates EVERY emission, so the
    * converged state is read back as: per type the max-count row (counts
    * only grow), then the final top-N by the operator's own
    * (cnt desc, type) order. */
  private def converged(table: String, topN: Int) =
    spark.table(table)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("day", "event_type")
          .orderBy(col("cnt").desc, col("rank").desc)))
      .filter(col("rn") === 1)
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(topN)
      .select("event_type", "cnt", "err", "rank")
      .as[(String, Long, Long, Long)].collect().toSeq

  test("exact regime: stream equals plain counts across micro-batch cuts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = StreamIngest.topkStream(events, k = 8, topN = 3).writeStream
      .format("memory").queryName("topk_stream").outputMode("update").start()

    // day 0 across two cuts: a 3+1, b 2+2, c 0+1 — exact-regime merge
    // is plain count addition, so the converged rows are the batch
    // counts with the (cnt desc, type) tiebreak (a=b=4 -> a first)
    var id = 0L
    def n(tpe: String, hour: Long): (Long, Long, Long, String, Double) = {
      id += 1; ev(id, hour, tpe)
    }
    input.addData(Seq(n("a", 1), n("a", 2), n("a", 3), n("b", 1), n("b", 2)): _*)
    q.processAllAvailable()
    input.addData(Seq(n("a", 4), n("b", 5), n("b", 6), n("c", 7)): _*)
    q.processAllAvailable()
    q.stop()

    assert(converged("topk_stream", 3) == Seq(
      ("a", 4L, 0L, 1L), ("b", 4L, 0L, 2L), ("c", 1L, 0L, 3L)))
  }

  test("eviction inherits the min count as err; min-count tie evicts the smallest type") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")

    val q = StreamIngest.topkStream(events, k = 2, topN = 2).writeStream
      .format("memory").queryName("topk_evict").outputMode("update").start()

    // batch 1 fills the k=2 monitor: a×5, b×3
    input.addData((1L to 5L).map(i => ev(i, i, "a")) ++
      (6L to 8L).map(i => ev(i, i, "b")): _*)
    q.processAllAvailable()
    // batch 2: c arrives twice — evicts b (min count 3), inherits
    // err 3, then counts up: c = (cnt 5, err 3); a=c=5 ties break
    // lexicographic in the report
    input.addData(Seq(ev(9, 9, "c"), ev(10, 10, "c")): _*)
    q.processAllAvailable()
    q.stop()

    assert(converged("topk_evict", 2) == Seq(
      ("a", 5L, 0L, 1L), ("c", 5L, 3L, 2L)))
  }
}
