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

  test("AQE splits the skewed side of a hot-key join (skew-join runtime re-plan)") {
    // The self-join family (jaccard/simhash bands) relies on AQE's
    // skew-join split as the runtime backstop when a bucket goes hot.
    // Prove the mechanism actually fires in this session's config:
    // thresholds lowered so a test-sized hot partition qualifies.
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val hot = spark.range(0, 120000)
        .select((when($"id" % 20 === 0, $"id" % 50).otherwise(lit(0L))).as("k"),
          concat(lit("payload_payload_payload_"), $"id").as("p"))
      val dim = spark.range(0, 50).select($"id".as("k"), ($"id" * 2).as("v"))
      val j = hot.join(dim, "k")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        "AQE did not re-plan the skewed join:\n" + plan.take(1500))
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt is deterministic and bounded") {
    val df = (1 to 100).map(i => (i.toLong, "x")).toDF("id", "k")
    val salts = Salted.withSalt(df, $"id", 8).select("__salt").as[Long].collect()
    assert(salts.forall(s => s >= 0 && s < 8))
    val salts2 = Salted.withSalt(df, $"id", 8).select("__salt").as[Long].collect()
    assert(salts.toSeq == salts2.toSeq)
  }
}
