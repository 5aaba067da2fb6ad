package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamIngest
import graft.vector.VectorOps

/** Streaming PSI (flatMapGroupsWithState, O(bins) state per dim)
  * converges to the batch driftPsi EXACTLY when fed the batch's own
  * bin extents — same Laplace doubles, same 9dp-decimal term sum,
  * same 6dp psi, across micro-batch cuts. PSI is count-based, so
  * unlike CUSUM the equality holds under ARBITRARY arrival order —
  * the spec scrambles the feed to prove it. */
class StreamDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streaming PSI == batch driftPsi given the batch's bin extents; state survives batch cuts") {
    val nDims = 64
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(when(col("label") < 5, "a").otherwise("b").as("grp"),
        col("embedding").cast("array<double>").as("v"))

    val batch = VectorOps.driftPsi(corpus)
      .select("dim", "psi").as[(Long, Double)].collect().toMap
    assert(batch.size == nDims)

    // the batch's own extents become the stream's configured grid
    val xd = corpus
      .select(col("grp"), posexplode(col("v")).as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("grp"),
        col("x").cast("double").as("x"))
    val extents = xd.groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .as[(Long, Double, Double)].collect()
      .map { case (d, mn, mx) => d -> (mn, mx) }.toMap

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val rows = input.toDF().toDF("dim", "grp", "x")
    val q = StreamIngest.driftPsiStream(rows, extents, nDims).writeStream
      .format("memory").queryName("drift_stream").outputMode("append").start()

    // scramble: sort by a hash of (dim, x) so every micro-batch mixes
    // dims and cohorts, then cut in three
    val feed = xd.as[(Long, String, Double)].collect()
      .sortBy { case (d, g, x) => (x.hashCode * 31 + d).hashCode }
    val (c1, rest) = feed.splitAt(feed.length / 3)
    val (c2, c3) = rest.splitAt(rest.length / 3)
    input.addData(c1.toSeq: _*); q.processAllAvailable()
    input.addData(c2.toSeq: _*); q.processAllAvailable()
    input.addData(c3.toSeq: _*); q.processAllAvailable()
    q.stop()

    // the LAST emission per dim (largest n_a+n_b) is the converged one
    val streamed = spark.table("drift_stream")
      .select("dim", "n_a", "n_b", "psi")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).map { case (d, es) => d -> es.maxBy(e => e._2 + e._3) }

    assert(streamed.size == nDims)
    val nA = corpus.filter(col("grp") === "a").count()
    val nB = corpus.filter(col("grp") === "b").count()
    streamed.foreach { case (d, (_, na, nb, psi)) =>
      assert(na == nA && nb == nB, s"dim $d incomplete: $na/$nb")
      assert(psi == batch(d), s"dim $d stream psi $psi != batch ${batch(d)}")
    }

    // mid-stream emissions exist (a dashboard reads progress, not
    // only the final state): at least one emission per dim per batch
    assert(spark.table("drift_stream").count() >= nDims * 2L)
  }
}
