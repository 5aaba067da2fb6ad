package graft

import graft.vector.VectorOps
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private def toy = Seq(
    (0L, Array(1.0, 0.0, 0.0)),
    (1L, Array(0.9, 0.1, 0.0)),   // close to 0
    (2L, Array(0.0, 1.0, 0.0)),   // orthogonal to 0
    (3L, Array(-1.0, 0.0, 0.0)),  // opposite of 0
    (4L, Array(0.8, 0.2, 0.0)))
    .toDF("vec_id", "v")

  test("cosine topk ranks by similarity with deterministic tiebreaks") {
    val r = VectorOps.cosineTopK(toy, toy.filter($"vec_id" === 0), k = 4)
      .orderBy("rank").select("vec_id", "cos").as[(Long, Double)].collect()
    assert(r.map(_._1).toSeq == Seq(1L, 4L, 2L, 3L))
    assert(r(0)._2 > 0.99 && r(2)._2 == 0.0 && r(3)._2 == -1.0)
  }

  test("brute-force baselines refuse oversized corpora unless forced") {
    // the guard is the enforced baseline-only contract: these two are
    // quadratic by construction and must never silently run at scale
    val e1 = intercept[IllegalArgumentException] {
      VectorOps.cosineTopK(toy, toy.limit(1), maxRows = 3)
    }
    assert(e1.getMessage.contains("lshTopK"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.cosineNearDupPairs(toy, 0.9, maxRows = 3)
    }
    assert(e2.getMessage.contains("lshNearDupPairs"), e2.getMessage)
    // force=true keeps the oracle usable on a deliberately-sampled slice
    assert(VectorOps.cosineTopK(toy, toy.limit(1), k = 2, maxRows = 3,
      force = true).count() == 2)
    assert(VectorOps.cosineNearDupPairs(toy, 0.99, maxRows = 3,
      force = true).count() >= 1)
  }

  test("recallAtK: per-query recall equals the independent exact∩approx intersection") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val r = VectorOps.recallAtK(e, col("vec_id") < 5, k = 10)
      .select("q_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(r.length == 5 && r.forall(_._2 == 10), r.toSeq)
    assert(r.forall { case (_, ne, nh, rec) =>
      nh >= 0 && nh <= ne && rec == math.round(nh.toDouble / ne * 1e6) / 1e6 }, r.toSeq)
    // n_hit must equal the intersection of the two public paths,
    // computed independently here
    val exact = VectorOps.cosineTopK(e, e.filter(col("vec_id") < 5), 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.lshTopK(e, col("vec_id") < 5, 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val hits = (exact & approx).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(r.forall { case (q, _, nh, _) => hits.getOrElse(q, 0L) == nh }, r.toSeq)

    // the IVF variant obeys the same bounds and intersection identity
    val ri = VectorOps.recallAtKIvf(e, col("vec_id") < 5, k = 10)
      .select("q_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(ri.length == 5 && ri.forall { case (_, ne, nh, _) => ne == 10 && nh <= ne }, ri.toSeq)
    val ivf = VectorOps.ivfTopK(e, col("vec_id") < 5, 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ihits = (exact & ivf).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(ri.forall { case (q, _, nh, _) => ihits.getOrElse(q, 0L) == nh }, ri.toSeq)

    // the PQ variant: same bounds and the same intersection identity
    // against its own serving path (8 default queries)
    val rp = VectorOps.recallAtKPq(e, nQueries = 5, k = 10)
      .select("q_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rp.length == 5 && rp.forall { case (_, ne, nh, _) => ne == 10 && nh <= ne }, rp.toSeq)
    val pq = VectorOps.pqTopK(e, nQueries = 5, k = 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val phits = (exact & pq).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(rp.forall { case (q, _, nh, _) => phits.getOrElse(q, 0L) == nh }, rp.toSeq)
  }

  test("kmeansInertia: hand-computed two-cluster convergence, curve non-increasing") {
    // seeds = vecs 0,1; clusters {0,2} and {1,3}; means (0.5,0)/(9.5,10)
    // → inertia 2.0 (seed round), then 4 × 0.25 = 1.0, stable
    val e = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)),
      (2L, Seq(1.0, 0.0)), (3L, Seq(9.0, 10.0)))
      .toDF("vec_id", "v")
    val r = VectorOps.kmeansInertia(e, nCells = 2, iters = 2)
      .select("iter", "n_vectors", "n_cells_used", "inertia")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq((0L, 4L, 2L, 2.0), (1L, 4L, 2L, 1.0), (2L, 4L, 2L, 1.0)), r)
  }

  test("cellSummary: occupancy covers the corpus, norms aggregate exactly") {
    // nCells=2 → centroids = vecs 0,1 (lowest ids); all of 0,1,4 lean
    // to their best-cos cell, 2 is orthogonal, 3 antipodal
    val out = VectorOps.cellSummary(toy, nCells = 2)
      .select("cell", "n_vectors", "sum_norm", "mean_norm")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._2).sum == 5L, "every vector lands in exactly one cell")
    out.foreach { case (_, n, s, m) => assert(math.abs(m - s / n) < 1e-12) }
    // unit-norm members: vec 0 (norm 1) and vec 2/3 (norm 1);
    // total mass = sum of all 5 norms rounded to 6 decimals
    val expectTotal = Seq(1.0, math.sqrt(0.82), 1.0, 1.0, math.sqrt(0.68))
      .map(x => math.rint(x * 1e6) / 1e6).sum
    assert(math.abs(out.map(_._3).sum - expectTotal) < 1e-9)
  }

  test("dimStats: exact per-dimension profile") {
    val out = VectorOps.dimStats(toy)
      .select("dim", "n", "mean_v", "min_v", "max_v")
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
    assert(out.forall(_._2 == 5L))
    val d1 = out.head
    assert(math.abs(d1._3 - (1.0 + 0.9 + 0.0 - 1.0 + 0.8) / 5) < 1e-9)
    assert(d1._4 == -1.0 && d1._5 == 1.0)
  }

  test("quantizeStats: int8 scales, reconstruction error, zero-dim guard") {
    val corpus = Seq(
      (1L, Seq(1.0, 0.0, -2.0)),
      (2L, Seq(0.5, 0.0, 2.54)))
      .toDF("vec_id", "v")
    val out = VectorOps.quantizeStats(corpus)
      .select("dim", "scale", "n", "max_abs_err", "rmse")
      .as[(Long, Double, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L) && out.forall(_._3 == 2L))
    // dim 1: scale 1/127; 1.0 → q=127 exact; 0.5 → q=round(63.5)=64,
    // err = 0.5 − 64/127
    val s1 = 1.0 / 127
    assert(out(0)._2 == s1)
    val e1 = math.abs(0.5 - 64 * s1)
    assert(math.abs(out(0)._4 - e1) < 1e-12, out(0).toString)
    assert(math.abs(out(0)._5 - math.sqrt(
      (math.rint(e1 * e1 * 1e12) / 1e12) / 2)) < 1e-12)
    // dim 2: all-zero → scale 0, q 0, zero error (no division blowup)
    assert(out(1)._2 == 0.0 && out(1)._4 == 0.0 && out(1)._5 == 0.0)
    // dim 3: scale 2.54/127 = 0.02; both values quantize exactly
    // (−2 → −100, 2.54 → 127)
    assert(out(2)._2 == 2.54 / 127)
    assert(out(2)._4 < 1e-15 && out(2)._5 < 1e-15)
  }

  test("mrlCurve: energy fractions by prefix, cos = sqrt(frac), zero-vector guard") {
    val corpus = Seq(
      (1L, Seq(3.0, 4.0, 0.0, 0.0)), // all energy in the first 2 dims
      (2L, Seq(0.0, 0.0, 0.0, 5.0)), // none until the last dim
      (3L, Seq(0.0, 0.0, 0.0, 0.0))) // zero vector → frac 0
      .toDF("vec_id", "v")
    val out = VectorOps.mrlCurve(corpus, prefixes = Seq(2, 4))
      .select("prefix_len", "n", "mean_energy_frac", "mean_cos")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(2L, 4L) && out.forall(_._2 == 3L))
    // L=2: fracs (1, 0, 0) → mean 1/3; cos (1, 0, 0) → 1/3
    assert(math.abs(out(0)._3 - 1.0 / 3) < 1e-6)
    assert(math.abs(out(0)._4 - 1.0 / 3) < 1e-6)
    // L=4: full prefixes → fracs (1, 1, 0), cos likewise → 2/3
    assert(math.abs(out(1)._3 - 2.0 / 3) < 1e-6)
    assert(math.abs(out(1)._4 - 2.0 / 3) < 1e-6)
  }

  test("covariance: diagonal matches population variance, symmetry-free upper triangle") {
    val out = VectorOps.covariance(toy.select($"vec_id", $"v"), dim = 3)
      .select("di", "dj", "n", "cov")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == 6) // 3·4/2 upper-triangle pairs
    assert(out.forall { case (i, j, n, _) => i <= j && n == 5 })
    // hand-check var(dim 1): values 1.0, 0.9, 0.0, -1.0, 0.8
    val xs = Seq(1.0, 0.9, 0.0, -1.0, 0.8)
    val mean = xs.sum / xs.size
    val varExp = xs.map(x => x * x).sum / xs.size - mean * mean
    val d11 = out.find(r => r._1 == 1 && r._2 == 1).get._4
    assert(math.abs(d11 - varExp) < 1e-9, s"$d11 vs $varExp")
    // cov(1,3): third component all zero → zero covariance
    assert(out.find(r => r._1 == 1 && r._2 == 3).get._4 == 0.0)
  }

  test("semanticClusters: chained near-dups share one rep; isolates rep themselves") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val clu = VectorOps.semanticClusters(e, 0.4)
      .select("vec_id", "cluster_rep").as[(Long, Long)].collect().toMap
    assert(clu.size == e.count())
    // reps are component minima: every rep maps to itself
    assert(clu.values.toSet.forall(r => clu(r) == r))
    // consistency with the public pair generator: every near-dup pair
    // shares a rep; vectors in no pair rep themselves
    val pairs = VectorOps.lshNearDupPairs(e, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty && pairs.forall { case (a, b) => clu(a) == clu(b) })
    val inPair = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clu.filterNot { case (v, _) => inPair(v) }.forall { case (v, r) => r == v })
  }

  test("pcaComponents: exact eigenstructure on a constructed spectrum; component 1 == pcaTopComponent") {
    // a corpus whose covariance is EXACTLY diag(3, 4/3, 1/3): four
    // copies of ±3e1, ±2e2, ±1e3 (means zero, axes uncorrelated) —
    // deflation must recover the axes in order with tight tolerances
    val rows = (for {
      (mag, axis) <- Seq((3.0, 0), (2.0, 1), (1.0, 2))
      sign <- Seq(1.0, -1.0); copy <- 0 until 4
    } yield {
      val v = Array.fill(3)(0.0); v(axis) = sign * mag
      (axis * 100L + copy * 10L + (if (sign > 0) 1L else 2L), v.toSeq)
    }).toDF("vec_id", "v")
    val multi = VectorOps.pcaComponents(rows, nComponents = 3, dim = 3)
      .select("component", "d", "loading", "eigenvalue")
      .as[(Long, Long, Double, Double)].collect()
    assert(multi.length == 9)
    def vec(k: Long) = multi.filter(_._1 == k).sortBy(_._2).map(_._3)
    val eig = (1 to 3).map(k => multi.find(_._1 == k).get._4)
    assert(math.abs(eig(0) - 3.0) < 0.05 && math.abs(eig(1) - 4.0 / 3) < 0.05
      && math.abs(eig(2) - 1.0 / 3) < 0.05, eig.toString)
    assert(eig(0) > eig(1) && eig(1) > eig(2), eig.toString)
    // each component is its axis (up to sign) and mutually orthogonal
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    for (k <- 1 to 3)
      assert(math.abs(math.abs(vec(k.toLong)(k - 1)) - 1.0) < 0.02, vec(k.toLong).toSeq)
    assert(math.abs(dot(vec(1), vec(2))) < 0.05)
    assert(math.abs(dot(vec(2), vec(3))) < 0.05)
    assert(math.abs(dot(vec(1), vec(3))) < 0.05)

    // on the real corpus (near-flat spectrum — ordering is only
    // guaranteed at convergence): component 1 must equal the
    // single-component operator VERBATIM, eigenvalues stay positive
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val m2 = VectorOps.pcaComponents(e, nComponents = 3)
      .select("component", "d", "loading", "eigenvalue")
      .as[(Long, Long, Double, Double)].collect()
    assert(m2.length == 192 && m2.forall(_._4 > 0.0))
    val c1 = m2.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)).sortBy(_._1).toSeq
    val single = VectorOps.pcaTopComponent(e, iters = 5)
      .select("d", "loading", "eigenvalue")
      .as[(Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(c1 == single, "deflation component 1 diverged from the single-component operator")
  }

  test("pcaComponents: distributed deflation branch equals the driver path bit-for-bit") {
    // every corpus in testdata is dim 64, so the gate always routes to
    // the BigDecimal driver path (dim <= driverMaxDim=512) — the
    // distributed dim²-frame loop's claimed bit-for-bit equivalence
    // was otherwise exercised by nothing (ADVICE r11). Forcing
    // driverMaxDim = 0 routes the SAME corpus through the distributed
    // branch; the driver path replicates its decimal arithmetic
    // exactly, so equality must be ==, not approximate.
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def run(cap: Int) = VectorOps.pcaComponents(e, nComponents = 3, driverMaxDim = cap)
      .select("component", "d", "loading", "eigenvalue")
      .as[(Long, Long, Double, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val distributed = run(0)
    val driver = run(512)
    assert(distributed == driver,
      "distributed deflation arithmetic diverged from the driver replication")
  }

  test("autoBandSize: the log2-occupancy law — floor 4 through the gate corpora, grows at scale") {
    // the gate corpora (500 at sf0.01, 2000 at sf0.1) must resolve to
    // the banding the static oracles restate (bandSize 4, nPlanes 8)
    assert(VectorOps.autoBandSize(500) == 4)
    assert(VectorOps.autoBandSize(2000) == 4)
    assert(VectorOps.autoBandSize(2048) == 4) // exact power-of-two boundary
    // beyond the floor: occupancy n/2^bs stays ≈ 128 (the measured
    // law that turned 9.3× wall at 10× data into 1.3×)
    assert(VectorOps.autoBandSize(20000) == 8)    // 10× probe corpus
    assert(VectorOps.autoBandSize(1L << 20) == 13)
    assert(VectorOps.autoBandSize(1L << 30) == 23)
    for (n <- Seq(10000L, 100000L, 10000000L)) {
      val occ = n.toDouble / (1L << VectorOps.autoBandSize(n))
      assert(occ <= 128.0 && occ > 32.0, s"n=$n occupancy $occ")
    }
    // the auto default and the explicit gate banding agree on results
    // at gate scale (same bs=4/np=8 resolution)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val auto = VectorOps.lshNearDupPairs(e, 0.4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val pinned = VectorOps.lshNearDupPairs(e, 0.4, nPlanes = 8, bandSize = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(auto == pinned && auto.nonEmpty)
    // mixing one explicit knob with one auto knob refuses UP FRONT: an
    // explicit nPlanes against a data-resolved bandSize would make the
    // multiple-of contract fail or pass depending on corpus size
    val mixed = intercept[IllegalArgumentException] {
      VectorOps.lshNearDupPairs(e, 0.4, nPlanes = 12)
    }
    assert(mixed.getMessage.contains("both explicit or both auto"))
  }

  test("intrinsicDim: a planar corpus embedded in 16-D reads ~2, far below ambient") {
    // 400 points on a 2-D plane inside R^16 (plus a constant offset so
    // cosines vary): the two-NN MLE must land near 2, nowhere near 16
    val rng = new scala.util.Random(7)
    val b1 = Array.tabulate(16)(i => if (i == 0) 1.0 else 0.0)
    val b2 = Array.tabulate(16)(i => if (i == 1) 1.0 else 0.0)
    val off = Array.tabulate(16)(i => if (i == 2) 4.0 else 0.0)
    val rows = (0 until 400).map { i =>
      val (a, b) = (rng.nextGaussian(), rng.nextGaussian())
      (i.toLong, Array.tabulate(16)(d => off(d) + a * b1(d) + b * b2(d)).toSeq)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "v")
    val r = VectorOps.intrinsicDim(df)
      .select("n_vectors", "n_dropped", "d_mle")
      .as[(Long, Long, Double)].head()
    // a couple of gaussian points can land close enough that the
    // 6dp-rounded cosine reads exactly 1.0 — those drop by design
    assert(r._1 == 400 && r._2 <= 6, s"unexpected drops: ${r._2}")
    assert(r._3 > 1.0 && r._3 < 4.0, s"planar corpus should read ~2: ${r._3}")
    // duplicates drop instead of poisoning the estimate with ln(x/0)
    val withDup = spark.createDataFrame(
      rows.take(50) :+ (999L, rows.head._2)).toDF("vec_id", "v")
    val r2 = VectorOps.intrinsicDim(withDup)
      .select("n_dropped").as[Long].head()
    assert(r2 >= 2, s"the duplicate pair must drop from both sides: $r2")
  }

  test("normOutliers: a constructed degenerate vector flags; healthy corpus z-scores stay inside the cut") {
    // the gate corpus never fires the flag (well-behaved synthetic
    // norms) — per the vacuous-match discipline the DETECTION is
    // proven here: 60 unit-ish vectors + one 20× blow-up (the fp16
    // overflow shape) → exactly that one flags
    val rows = (0 until 60).map { i =>
      val v = Array.tabulate(8)(d => if (d == i % 8) 1.0 else 0.01 * ((i + d) % 3))
      (i.toLong, v.toSeq)
    } :+ (60L, Array.fill(8)(20.0).toSeq)
    val df = spark.createDataFrame(rows).toDF("vec_id", "v")
    val out = VectorOps.normOutliers(df)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(out(60L), "the 20x vector must flag")
    assert(out.count(_._2) == 1, s"exactly one outlier expected: ${out.filter(_._2)}")
    // and the zero-vector edge: norm 0, no NaN
    val zero = VectorOps.normOutliers(
      spark.createDataFrame(Seq((0L, Seq(0.0, 0.0)), (1L, Seq(3.0, 4.0))))
        .toDF("vec_id", "v"))
      .select("vec_id", "norm", "z").as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(zero(0)._2 == 0.0 && !zero(0)._3.isNaN)
    assert(zero(1)._2 == 5.0)
  }

  test("pqProfile: slices assign to the nearest codebook entry; occupancy and mse are exact") {
    // codebook = slices of vecs 0 and 1 (first-k convention, k=2)
    val d = Seq(
      (0L, Array(0.0, 0.0, 10.0, 10.0)),
      (1L, Array(5.0, 5.0, 0.0, 0.0)),
      (2L, Array(0.4, 0.4, 9.0, 9.0)),  // sub0 → code0 (d²=0.32), sub1 → code0 (d²=2)
      (3L, Array(4.0, 4.0, 1.0, 1.0)))  // sub0 → code1 (d²=2),    sub1 → code1 (d²=2)
      .toDF("vec_id", "v")
    val r = VectorOps.pqProfile(d, m = 2, k = 2, dim = 4)
      .select("subspace", "code", "n", "mse")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(r == Set(
      (0L, 0L, 2L, 0.16), (0L, 1L, 2L, 1.0),
      (1L, 0L, 2L, 1.0), (1L, 1L, 2L, 1.0)), r)
  }

  test("signHammingProfile: hand-checked sign bits, hamming buckets, exact cosine means") {
    val d = Seq(
      (0L, Array(1.0, 1.0, 1.0, 1.0)),    // signs 1111
      (1L, Array(1.0, -1.0, 1.0, -1.0)),  // signs 0101 → hamming 2 vs v0, cos 0
      (2L, Array(1.0, -1.0, 1.0, -1.0)))  // = v1 → hamming 0, cos 1
      .toDF("vec_id", "v")
    val r = VectorOps.signHammingProfile(d, dim = 4)
      .select("hamming", "n_pairs", "mean_cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(r == Set((2L, 1L, 0.0), (0L, 1L, 1.0)), r)
  }

  test("pqTopK: ADC distances are table-lookup sums over codes; ties break by id; self excluded") {
    // same first-k codebook convention as pqProfile (codes = vecs 0,1)
    val d = Seq(
      (0L, Array(0.0, 0.0, 10.0, 10.0)),
      (1L, Array(5.0, 5.0, 0.0, 0.0)),
      (2L, Array(0.4, 0.4, 9.0, 9.0)),  // encodes to (code0, code0) → ADC 0 for query 0
      (3L, Array(4.0, 4.0, 1.0, 1.0)))  // encodes to (code1, code1) → ADC 50+200
      .toDF("vec_id", "v")
    val r = VectorOps.pqTopK(d, nQueries = 1, k = 3, m = 2, kCodes = 2, dim = 4)
      .orderBy("rank").select("q_id", "vec_id", "adc_dist", "rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    // vec1 also encodes to (code1, code1): exact 250.0 tie with vec3, id breaks it
    assert(r == Seq((0L, 2L, 0.0, 1L), (0L, 1L, 250.0, 2L), (0L, 3L, 250.0, 3L)), r)
  }

  test("pcaTopComponent: recovers the dominant direction, unit norm, shared eigenvalue") {
    // all points on the line y = 4x/3 → rank-1 covariance whose top
    // eigenvector is exactly ±(0.6, 0.8)
    val d = Seq(
      (0L, Array(3.0, 4.0)), (1L, Array(6.0, 8.0)),
      (2L, Array(-3.0, -4.0)), (3L, Array(0.0, 0.0)))
      .toDF("vec_id", "v")
    val r = VectorOps.pcaTopComponent(d, dim = 2, iters = 5)
      .orderBy("d").select("loading", "eigenvalue").as[(Double, Double)].collect()
    val (l1, l2) = (r(0)._1, r(1)._1)
    assert(math.abs(math.abs(l1) - 0.6) < 1e-3 && math.abs(math.abs(l2) - 0.8) < 1e-3, r.toSeq)
    assert(l1 * l2 > 0, "components of one direction share a sign")
    assert(math.abs(l1 * l1 + l2 * l2 - 1.0) < 1e-3, "unit norm")
    assert(r(0)._2 > 0 && r(0)._2 == r(1)._2, "one eigenvalue, every row")
  }

  test("labelCentroids: mean embedding per label as (label, dim) rows") {
    val labeled = Seq(
      (0, Array(1.0, 3.0)),
      (0, Array(3.0, 5.0)),
      (1, Array(10.0, 0.0)))
      .toDF("label", "v")
    val out = VectorOps.labelCentroids(labeled)
      .select("label", "dim", "n", "mean_v")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((0L, 1L, 2L, 2.0), (0L, 2L, 2L, 4.0),
      (1L, 1L, 1L, 10.0), (1L, 2L, 1L, 0.0)))
  }

  test("centroidSimilarity: cosine between class means") {
    // label 0 centroid = (2, 0); label 1 centroid = (0, 3);
    // label 2 centroid = (4, 0) → cos(0,1)=0, cos(0,2)=1, cos(1,2)=0
    val labeled = Seq(
      (0, Array(1.0, 0.0)), (0, Array(3.0, 0.0)),
      (1, Array(0.0, 3.0)),
      (2, Array(4.0, 0.0)))
      .toDF("label", "v")
    val out = VectorOps.centroidSimilarity(labeled)
      .select("label_a", "label_b", "cos_sim")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq((0L, 1L, 0.0), (0L, 2L, 1.0), (1L, 2L, 0.0)))
  }

  test("lsh buckets: same direction → same bucket, opposite → different") {
    val e = toy.withColumn("v", col("v").cast("array<double>"))
    val b = VectorOps.lshBuckets(e, nPlanes = 8, dim = 3)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L)) // nearly identical directions
    assert(b(0L) != b(3L)) // antipodal: every plane sign flips
  }

  test("lsh topk returns bucket-local exact rerank") {
    val e = toy.withColumn("v", col("v").cast("array<double>"))
    val r = VectorOps.lshTopK(e, col("vec_id") === 0, k = 3, nPlanes = 8, dim = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(r.contains(1L) && !r.contains(3L))
  }

  test("ivf topk: probes nearest cells, scores agree with exact where they overlap") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val ivf = VectorOps.ivfTopK(e, $"vec_id" < 3, k = 5)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty && ivf.length <= 15)
    val exact = VectorOps.cosineTopK(e, e.filter($"vec_id" < 3), k = Int.MaxValue)
      .select("q_id", "vec_id", "cos").as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    // IVF never invents scores: every (q, v, cos) must equal the exact cosine
    ivf.foreach { case (q, v, c) => assert(exact((q, v)) == c) }
  }

  test("banded lsh near-dup pairs are a subset of brute-force with identical scores") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val lsh = VectorOps.lshNearDupPairs(e, 0.4)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    val brute = VectorOps.cosineNearDupPairs(e, 0.4)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(lsh.nonEmpty && lsh.subsetOf(brute))
  }

  test("labelMargin: clean examples score positive, a mislabeled one negative, ties pick lowest label") {
    // 3 orthogonal class directions; vec 4 carries label 0 but sits on
    // label 1's axis (mislabeled); vec 1 at e1 is equidistant (cos 0)
    // from the label-1 and label-2 centroids → tie breaks to label 1
    val vs = Seq(
      (1L, 0, Seq(1.0, 0.0, 0.0)),
      (2L, 0, Seq(1.0, 0.0, 0.0)),
      (3L, 1, Seq(0.0, 1.0, 0.0)),
      (4L, 0, Seq(0.0, 1.0, 0.0)), // mislabeled: label 0, on e2
      (5L, 2, Seq(0.0, 0.0, 1.0)))
      .toDF("vec_id", "label", "v")
    val out = VectorOps.labelMargin(vs)
      .select("vec_id", "label", "own_cos", "other_label", "other_cos", "margin")
      .as[(Long, Int, Double, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // label-0 centroid = (2,1,0)/√5 direction: vec 1 own ≈ 0.894427
    assert(out(1L)._3 > 0.8 && out(1L)._6 > 0.8)
    assert(out(1L)._4 == 1L && out(1L)._5 == 0.0, "cos-0 tie must pick the lowest other label")
    // the mislabeled vec: own ≈ 0.447, best other = label 1 at 1.0
    assert(out(4L)._4 == 1L && out(4L)._5 == 1.0)
    assert(out(4L)._6 < 0, "mislabeled example must have a negative margin")
  }

  test("on real embeddings: lsh candidates ⊂ brute-force universe, top-1 usually agrees") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val exact = VectorOps.cosineTopK(e, e.filter($"vec_id" < 3), 5)
    val approx = VectorOps.lshTopK(e, $"vec_id" < 3, 5)
    assert(exact.count() == 15)
    assert(approx.count() <= 15) // bucket may hold fewer than k
  }

  test("driftPsi: shifted cohort lights up, identical cohorts read ~0, grid complete") {
    // dim 1 shifts by +10 in cohort b; dim 2 identical in both
    val rows = (0 until 200).map { i =>
      ("a", Seq((i % 20).toDouble, (i % 7).toDouble))
    } ++ (0 until 200).map { i =>
      ("b", Seq((i % 20).toDouble + 10.0, (i % 7).toDouble))
    }
    val out = graft.vector.VectorOps.driftPsi(rows.toDF("grp", "v"))
      .as[(Long, Double)].collect().toMap
    assert(out.size == 2)
    assert(out(1L) > 0.25, s"shifted dim must cross the investigate line: $out")
    assert(math.abs(out(2L)) < 0.01, s"identical dim must read stable: $out")
  }

  test("knnReciprocity: matches a plain-Scala reference on a fixed geometry") {
    val pts = Seq(
      1L -> Seq(1.0, 0.0), 2L -> Seq(0.999, 0.01),
      3L -> Seq(0.9, -0.4), 4L -> Seq(0.9, 0.42), 5L -> Seq(0.88, -0.45))
    val vecs = pts.toDF("vec_id", "v")
    // independent reference model: 1-NN by cosine with the op's
    // (cos desc, id asc) tiebreak, then count mutual edges
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val nn = pts.map { case (i, vi) =>
      i -> pts.filter(_._1 != i)
        .maxBy { case (j, vj) => (math.rint(cos(vi, vj) * 1e6) / 1e6, -j) }._1
    }.toMap
    val mutual = nn.count { case (i, j) => nn(j) == i }
    val got = graft.vector.VectorOps.knnReciprocity(vecs, k = 1)
      .select("n_edges", "n_mutual", "reciprocity")
      .as[(Long, Long, Double)].head()
    assert(got._1 == 5, got.toString)
    assert(got._2 == mutual.toLong, s"$got vs reference $mutual (nn=$nn)")
    assert(got._3 == mutual.toDouble / 5, got.toString)
    // the reference itself must contain at least one mutual AND one
    // one-way edge, or the fixture proves nothing
    assert(mutual >= 2 && mutual < 5, nn.toString)
  }

  test("ivfProbeSweep: recall is monotone in nProbe and hits 1.0 at full probe") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val r = graft.vector.VectorOps.ivfProbeSweep(e, col("vec_id") < 5,
      k = 5, nCells = 8, probes = Seq(1, 4, 8))
      .select("n_probe", "n_exact", "n_hits", "recall")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r.map(_._1) == Seq(1L, 4L, 8L))
    assert(r.forall(_._2 == 25), r.toString) // 5 queries x k=5 truth rows
    // monotone: probing more cells never loses a hit
    assert(r.sliding(2).forall(p => p(0)._3 <= p(1)._3), r.toString)
    // probing EVERY cell scans the whole corpus -> exact recall
    assert(r.last._4 == 1.0, r.toString)
  }

  test("filteredTopK: the query's own class never appears; ranks re-pack after the filter") {
    // labels: vecs 1,2 class 0; vecs 3,4,5 class 1. query = vec 1.
    // nearest overall is vec 2 (same class) - it must NOT appear;
    // the top hits are the class-1 vectors only
    val vecs = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.99, 0.1), 0),
      (3L, Seq(0.9, 0.2), 1), (4L, Seq(0.0, 1.0), 1), (5L, Seq(-1.0, 0.0), 1))
      .toDF("vec_id", "v", "label")
    val got = graft.vector.VectorOps.filteredTopK(vecs, vecs.filter($"vec_id" === 1), k = 2)
      .select("q_id", "vec_id", "label", "rank")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4).toSeq
    assert(got.map(_._2) == Seq(3L, 4L), got)
    assert(got.forall(_._3 == 1L))
  }

  test("whitenOutliers: one broken dim outranks norm-normal vectors; zero-var dims drop") {
    // dim 1 alternates ±1 (var 0.8), dim 2 is 0 except v5's 10
    // (mean 2, std 4), dim 3 is constant -> dropped (n_dims = 2).
    // D²: v5 = 0 + 2² = 4; v1..v4 = 1/0.8 + 0.25 = 1.5 — the broken
    // dim wins despite v5's ordinary norm ranking below v1..v4's
    val vecs = Seq(
      (1L, Seq(1.0, 0.0, 7.0)), (2L, Seq(-1.0, 0.0, 7.0)),
      (3L, Seq(1.0, 0.0, 7.0)), (4L, Seq(-1.0, 0.0, 7.0)),
      (5L, Seq(0.0, 10.0, 7.0)))
      .toDF("vec_id", "v")
    val got = graft.vector.VectorOps.whitenOutliers(vecs, topK = 3)
      .select("vec_id", "n_dims", "d2")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(5L, 1L, 2L), got)
    assert(got.forall(_._2 == 2L), got)
    assert(got.head._3 == 4.0, got.head.toString)
    assert(got(1)._3 == 1.5 && got(2)._3 == 1.5, got.toString)
  }
}
