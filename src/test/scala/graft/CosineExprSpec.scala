package graft

import graft.functions.CosineSimilarity
import graft.vector.VectorOps
import org.apache.spark.sql.functions._

class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = Seq(
    (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
    (Array(1.0, 0.0), Array(0.0, 1.0)),
    (Array(1.0, 1.0), Array(-1.0, -1.0)),
    (Array(0.3, -0.7, 0.11, 9.0), Array(2.0, 0.5, -3.3, 0.25)))
    .toDF("a", "b")

  /** Reference implementation: strict sequential accumulation — the
    * same arithmetic the DuckDB oracle performs. */
  private def cosRef(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    for (i <- a.indices) { dot += a(i) * b(i); nx += a(i) * a(i); ny += b(i) * b(i) }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  test("expression matches sequential-reference arithmetic bit-for-bit") {
    val in = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 1.0), Array(-1.0, -1.0)),
      (Array(0.3, -0.7, 0.11, 9.0), Array(2.0, 0.5, -3.3, 0.25)))
    val got = in.toDF("a", "b").select(CosineSimilarity($"a", $"b")).as[Double].collect()
    in.zip(got).foreach { case ((a, b), g) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(cosRef(a, b)), s"for ${a.toSeq} · ${b.toSeq}")
    }
  }

  test("agrees with the HOF fold to 1e-12 (ULP-level reassociation allowed)") {
    val r = pairs.select(
      CosineSimilarity($"a", $"b").as("native"),
      (VectorOps.dot($"a", $"b") / (VectorOps.norm($"a") * VectorOps.norm($"b"))).as("hof"))
      .as[(Double, Double)].collect()
    r.foreach { case (n, h) => assert(math.abs(n - h) < 1e-12) }
  }

  test("participates in whole-stage codegen on a real scan") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val df = e.crossJoin(e.limit(1).select($"v".as("qv")))
      .select(CosineSimilarity($"v", $"qv").as("c"))
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    // a `*(n)` stage prefix on the projecting operator == inside
    // WholeStageCodegen (AQE's rendering omits the literal node name)
    assert(plan.linesIterator.exists(l => l.contains("cosine_sim") && l.contains("*(")),
      plan.take(800))
  }

  test("SQL registration via the GraftExtensions function builder") {
    Graft.registerFunctions(spark)
    pairs.createOrReplaceTempView("vp")
    val v = spark.sql("SELECT cosine_sim(a, b) AS c FROM vp")
      .as[Double].collect()
    assert(v.length == 4 && math.abs(v(0) - 1.0) < 1e-15)
  }

  test("SQL path coerces array<float> inputs (the raw embeddings column type)") {
    Graft.registerFunctions(spark)
    // float arrays, NOT pre-cast: the registration must coerce them —
    // without the Cast the expression reads 8-byte slots over 4-byte
    // elements (garbage) or throws ClassCastException
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .createOrReplaceTempView("emb_raw")
    val got = spark.sql(
      """SELECT cosine_sim(a.embedding, a.embedding) AS c FROM emb_raw a
         WHERE a.vec_id < 10""").as[Double].collect()
    assert(got.length == 10)
    got.foreach(c => assert(math.abs(c - 1.0) < 1e-12, s"self-cosine $c != 1"))
  }
}
