package graft

import graft.analytics.Salted
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-phase aggregation equals direct aggregation") {
    // 90% of rows on one hot key — the shape that straggles at scale
    val df = (1 to 10000).map { i =>
      val k = if (i % 10 == 0) s"user${i % 7}" else "hot_user"
      (i.toLong, k, (i % 100) / 4.0)
    }.toDF("event_id", "user", "value")

    val direct = df.groupBy($"user".as("k"))
      .agg(sum($"value".cast("decimal(28,6)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap

    val salted = Salted.sumCountByKey(df, $"user", $"value", $"event_id", buckets = 16)
      .as[(String, Double, Long)].collect().map { case (k, s, n) => k -> ((s, n)) }.toMap

    assert(salted == direct)
    assert(salted("hot_user")._2 == 9000L)
  }

  test("salt is deterministic and bounded") {
    val df = (1 to 100).map(i => (i.toLong, "x")).toDF("id", "k")
    val salts = Salted.withSalt(df, $"id", 8).select("__salt").as[Long].collect()
    assert(salts.forall(s => s >= 0 && s < 8))
    val salts2 = Salted.withSalt(df, $"id", 8).select("__salt").as[Long].collect()
    assert(salts.toSeq == salts2.toSeq)
  }
}
