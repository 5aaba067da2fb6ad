package graft

import graft.vector.VectorOps
import org.apache.spark.sql.functions._

/** Recall drill for the IVF coarse quantizers: top-10 recall of the
  * probed search against the brute-force baseline, stub codebook
  * (lowest-id vectors) vs trained (deterministic Lloyd's) codebook.
  *
  * The recall comparison runs on CLUSTERED synthetic vectors: the
  * testdata embeddings are isotropic (no cluster structure), where
  * any balanced quantizer scores the same and differences are noise.
  * The synthetic corpus has 16 true clusters assigned by a
  * multiplicative hash, so the 16 lowest-id vectors (the stub
  * codebook) cover only ~10 of them and several near-duplicate
  * centroids split clusters across cells — training has to
  * rediscover the missing clusters to win, which is exactly the
  * failure mode a trained quantizer exists to fix. */
class KmeansIvfSpec extends SparkSpec {
  import spark.implicits._

  /** 2000 vectors in 16 well-separated clusters, deterministic seed.
    * Cluster of vector i = hash(i) mod 16 — low ids under-cover. */
  private lazy val clustered = {
    val rng = new scala.util.Random(42)
    val centers = Array.fill(16, 16)(rng.nextGaussian() * 3.0)
    val rows = (0 until 2000).map { i =>
      val c = (((i * 2654435761L) >>> 7) % 16).toInt
      (i.toLong, centers(c).map(_ + rng.nextGaussian() * 0.3).toSeq)
    }
    rows.toDF("vec_id", "v").persist()
  }

  private def recallAt10(got: org.apache.spark.sql.DataFrame,
                         brute: Set[(Long, Long)]): Double = {
    val g = got.select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    g.intersect(brute).size.toDouble / brute.size
  }

  test("trained quantizer beats the under-covering stub on clustered data") {
    // queries from the id interior (none are codebook vectors);
    // nProbe=2 so a cluster split across >2 cells actually costs recall
    val qIds = $"vec_id" >= 100 && $"vec_id" < 110
    val brute = VectorOps.cosineTopK(clustered, clustered.filter(qIds), 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(brute.size == 100)
    val km = VectorOps.kmeansCentroids(clustered, 16, iters = 5)
    val stub = recallAt10(
      VectorOps.ivfTopK(clustered, qIds, 10, nProbe = 2), brute)
    val trained = recallAt10(
      VectorOps.ivfTopK(clustered, qIds, 10, nProbe = 2, quantizer = Some(km)), brute)
    info(f"recall@10 nProbe=2 (clustered corpus): stub=$stub%.3f trained=$trained%.3f")
    assert(trained >= stub, f"trained $trained%.3f < stub $stub%.3f")
    assert(trained >= 0.9, f"trained recall $trained%.3f below 0.9")
    // the stub's real penalty on clustered data is SCAN COST, not
    // recall: uncovered clusters pile whole into other centroids'
    // cells, blowing the nProbe/nCells fair-share scan bound that is
    // IVF's entire point at 100 TB. Training must restore balance.
    def maxCell(cents: org.apache.spark.sql.DataFrame): Long =
      VectorOps.ivfAssign(clustered, cents)
        .groupBy("cell").count().agg(max("count")).as[Long].head()
    val stubMax = maxCell(VectorOps.ivfCentroids(clustered, 16))
    val kmMax = maxCell(km)
    info(s"max cell size: stub=$stubMax trained=$kmMax fair=${2000 / 16}")
    assert(kmMax < stubMax, s"training did not improve balance: $kmMax vs $stubMax")
    assert(kmMax <= 2000 / 16 * 2, s"unbalanced trained cell: $kmMax rows")
  }

  test("on isotropic testdata the trained quantizer stays comparable (recall floor)") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val brute = VectorOps.cosineTopK(e, e.filter($"vec_id" < 5), 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val trained = recallAt10(
      VectorOps.ivfTopK(e, $"vec_id" < 5, 10,
        quantizer = Some(VectorOps.kmeansCentroids(e, 16, iters = 5))),
      brute)
    info(f"recall@10 nProbe=4 (isotropic corpus): trained=$trained%.3f")
    // isotropic vectors have no cluster structure, so ANY coarse
    // quantizer at nProbe=4/16 pays a recall tax and the exact number
    // is boundary lottery, not quality signal (the clustered test
    // above is the discriminative one); this is a collapse guard only
    assert(trained >= 0.6, f"trained recall $trained%.3f below 0.6")
  }

  test("bisecting splits the heavy drift clump plain k-means cannot") {
    // the __ivfdrift shape in miniature: an isotropic base corpus plus
    // a dominant TIGHT clump (drifted ingest) — farthest-init Lloyd's
    // seeds one centroid in the clump and leaves it whole, while the
    // PCA-median bisection keeps halving whatever cell is heaviest
    val rng = new scala.util.Random(7)
    val base = (0 until 400).map { i =>
      val v = Array.fill(16)(rng.nextGaussian()); val n = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / n).toSeq)
    }
    val clump = (0 until 1600).map { i =>
      val v = Array.fill(16)(rng.nextGaussian() * 0.1)
      v(3) += 5.0 // one tight direction holds 80% of the corpus
      (1000L + i, v.toSeq)
    }
    val corpus = (base ++ clump).toDF("vec_id", "v").persist()
    def maxCell(cents: org.apache.spark.sql.DataFrame): Long =
      VectorOps.ivfAssign(corpus, cents)
        .groupBy("cell").count().agg(max("count")).as[Long].head()
    val fair = 2000L / 16
    val kmMax = maxCell(VectorOps.kmeansCentroids(corpus, 16, iters = 5))
    val biMax = maxCell(VectorOps.bisectingCentroids(corpus, 16))
    info(s"max cell: kmeans=$kmMax bisecting=$biMax fair=$fair")
    assert(kmMax >= 4 * fair, s"premise broke: k-means balanced the clump ($kmMax)")
    assert(biMax <= 4 * fair, s"bisecting left a heavy cell: $biMax (fair $fair)")
    assert(biMax < kmMax / 2, s"bisecting not better: $biMax vs $kmMax")
    // the codebook contract holds: dense small ids, nCells rows
    val cents = VectorOps.bisectingCentroids(corpus, 16)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(cents.map(_._1).toSeq == (0L until cents.length).toSeq)
    assert(cents.length <= 16 && cents.length >= 8)
    corpus.unpersist()
  }

  test("bisecting training is deterministic (same corpus -> same codebook)") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = VectorOps.bisectingCentroids(e, 8)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val b = VectorOps.bisectingCentroids(e, 8)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("k-means training is deterministic (same corpus -> same codebook)") {
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val a = VectorOps.kmeansCentroids(e, 8, iters = 3)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val b = VectorOps.kmeansCentroids(e, 8, iters = 3)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("farthest-point seeding refuses above maxRows; seedSample is the scale path") {
    // the nCells sequential full scans are an index-BUILD cost — above
    // the guard they must refuse loudly, not silently run 16 corpus
    // scans (the cosineTopK contract, extended to seeding by r11
    // VERDICT ask #3)
    val ex = intercept[IllegalArgumentException] {
      VectorOps.farthestPointCentroids(clustered, 4, maxRows = 100L)
    }
    assert(ex.getMessage.contains("seedSample"),
      s"refusal must point at the blessed scale path: ${ex.getMessage}")
    // the sampled-seed path runs under the same guard and still covers
    // the cluster structure: with 16 well-separated clusters a 25%
    // uniform sample keeps every cluster populated, so the greedy
    // maxmin chain still lands one seed per distinct region
    val cents = VectorOps.farthestPointCentroids(
      clustered, 16, seedSample = 0.25, maxRows = 1000L)
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    assert(cents.map(_._1) == (0L until 16L))
    // seeds are far apart: max pairwise cosine below the in-cluster
    // cosine (~0.99 at sigma 0.3 around radius-12 centers)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val worst = (for {
      i <- cents.indices; j <- cents.indices if i < j
    } yield cos(cents(i)._2, cents(j)._2)).max
    assert(worst < 0.95, s"sampled seeding merged two clusters: max pair cosine $worst")
    // force=true remains the oracle escape hatch
    val forced = VectorOps.farthestPointCentroids(
      clustered, 4, maxRows = 100L, force = true)
    assert(forced.count() == 4)
  }
}
