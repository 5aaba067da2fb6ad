package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * `cosineTopK` is the exact baseline: query set broadcast against the
  * corpus, dot products via codegen'd higher-order functions
  * (`zip_with` + `aggregate`), one window per query for top-k. At
  * 100 TB the corpus side stays partition-parallel and nothing
  * shuffles except the per-query top-k (k rows per partition after
  * the window's partial rank — bounded).
  *
  * `lshBuckets`/`lshTopK` is the scale path: random-hyperplane signs
  * (Charikar, STOC'02) built from a deterministic md5-derived
  * pseudo-random projection, so candidates come from a bucket join.
  */
object VectorOps {

  /** Sequential-fold dot product in double — matches a left-to-right
    * SQL evaluation bit-for-bit. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Exact cosine top-k of `corpus` rows for each row of `queries`
    * (both: vec_id, v: array<double>). Scores rounded to `roundTo`
    * decimals; total order (score desc, vec_id asc). */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                 roundTo: Int = 6): DataFrame = {
    val q = broadcast(
      queries.select(
        col("vec_id").as("q_id"),
        col("v").as("qv"),
        norm(col("v")).as("qn")))
    val scored = corpus
      .withColumn("n", norm(col("v")))
      .crossJoin(q)
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), roundTo))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dim d): maps md5 to [-0.5, 0.5). Reproducible anywhere. */
  private def planeComponent(p: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(s"plane$p#"), d.cast("string"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)) - 0.5

  /** Sign-bucket signature from `nPlanes` hyperplanes over `v`. */
  def lshSignature(v: Column, nPlanes: Int = 8): Column = {
    val bits: Seq[Column] = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(v, transform(v, (_, i) => planeComponent(p, i)), (x, h) => x * h),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << (nPlanes - 1 - p))).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN top-k: candidates restricted to the query's LSH bucket, then
    * exact cosine rerank. Trades recall for a bucket-local join. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              nPlanes: Int = 8, roundTo: Int = 6): DataFrame = {
    val cb = corpus.withColumn("bucket", lshSignature(col("v"), nPlanes))
    val qb = broadcast(
      queries.select(col("vec_id").as("q_id"), col("v").as("qv"))
        .withColumn("bucket", lshSignature(col("qv"), nPlanes))
        .withColumn("qn", norm(col("qv"))))
    val scored = cb.join(qb, "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        round(dot(col("v"), col("qv")) / (norm(col("v")) * col("qn")), roundTo))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank").cast("long").as("rank"))
  }
}
