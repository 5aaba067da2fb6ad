package graft

import graft.text._
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def toyDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),  // near-dup of 1
    (3L, "completely different words entirely here now today"),
    (4L, "the quick brown fox jumps over the lazy dog"),  // exact dup of 1
    (5L, "zebra yak xylophone wombat vulture unicorn"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val e = Dedup.exact(toyDocs)
    assert(e.count() == 4)
    val dup = e.filter($"n_copies" === 2).select("rep_doc_id").as[Long].head()
    assert(dup == 1L)
  }

  test("ngram jaccard finds near-dups, not unrelated docs") {
    val p = Dedup.ngramJaccardPairs(toyDocs, 3, 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p.contains((1L, 2L)) && p.contains((1L, 4L)) && p.contains((2L, 4L)))
    assert(!p.exists(x => x._1 == 3L || x._2 == 3L))
  }

  test("jaccard of exact dup is 1.0") {
    val j = Dedup.ngramJaccardPairs(toyDocs, 3, 0.3)
      .filter($"doc_a" === 1 && $"doc_b" === 4)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("minhash LSH recovers exact and near dups") {
    val p = Dedup.minhashLshPairs(toyDocs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(p.contains((1L, 4L))) // identical → identical signature
    assert(!p.exists(x => x._1 == 5L || x._2 == 5L))
  }

  test("contamination: flags 8-gram overlap with the benchmark, not 7-gram") {
    val eightShared = "one two three four five six seven eight"
    val bench = Seq((100L, s"$eightShared and unrelated benchmark tail here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"prefix words then $eightShared closing words"),        // shares the 8-gram
      (2L, "one two three four five six seven NOPE different end"), // only 7 shared → clean
      (3L, "completely unrelated text with no overlap at all ok"))
      .toDF("doc_id", "text")
    val c = Dedup.contamination(corpus, bench)
      .select("doc_id", "n_shared_grams").as[(Long, Long)].collect().toMap
    assert(c.contains(1L) && c(1L) >= 1)
    assert(!c.contains(2L) && !c.contains(3L))
  }

  test("two-stage jaccard verifies LSH candidates with exact scores") {
    val two = Dedup.ngramJaccardTwoStage(toyDocs)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // identical docs always share all bands, and the verify stage must
    // reproduce the exact jaccard (1.0 for the 1~4 exact dup)
    assert(two.contains((1L, 4L, 1.0)))
    // every surviving pair's score must agree with the exact operator
    val exact = Dedup.ngramJaccardPairs(toyDocs, 3, 0.3)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(two.subsetOf(exact))
  }

  test("containment: directional scores flag a doc embedded in a larger host") {
    val docs = toyDocs.unionByName(Seq(
      // doc 1 verbatim plus a tail: 1 is fully CONTAINED in 6 while
      // jaccard(1,6) is only 7/10 — the asymmetry the operator exists for
      (6L, "the quick brown fox jumps over the lazy dog with extra tail"))
      .toDF("doc_id", "text"))
    val c = Dedup.containmentPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b", "cont_a_in_b", "cont_b_in_a", "max_containment")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // exact dup: both directions 1.0
    assert(c((1L, 4L)) == ((1.0, 1.0, 1.0)))
    // the embedding pair: A fully inside B, B only 70% inside A
    assert(c((1L, 6L)) == ((1.0, 0.7, 1.0)))
    // every reported pair satisfies max = greatest of the directions
    c.values.foreach { case (ab, ba, m) => assert(m == math.max(ab, ba)) }
    // and max_containment ≥ jaccard is a theorem (same intersection,
    // smaller denominator) — cross-check against the exact operator
    val j = Dedup.ngramJaccardPairs(docs, 3, 0.0)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    c.foreach { case (k, (_, _, m)) => j.get(k).foreach(jv => assert(m >= jv)) }
  }

  test("dedupSweep: the threshold curve steps where pair jaccards sit") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),  // exact dup: j = 1.0
      (3L, "a b c d e f g h i z"),  // 7 of 8 shingles shared: j = 7/9 ≈ 0.778
      (4L, "q r s t u v w x y zz")) // unrelated
      .toDF("doc_id", "text")
    val curve = Dedup.dedupSweep(docs)
      .select("tau", "n_pairs", "n_docs_dropped", "n_docs_surviving")
      .as[(Double, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(curve.map(_._1) == Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
    // the (1,2) exact pair survives every τ; the (1,3)/(2,3) pairs at
    // ~0.778 drop out at τ=0.8 — so the curve must STEP between 0.7
    // and 0.8, and the strict-dup tail must be exactly one pair
    val at07 = curve.find(_._1 == 0.7).get
    val at08 = curve.find(_._1 == 0.8).get
    assert(at08._2 == 1L && at08._3 == 1L && at08._4 == 3L, at08.toString)
    assert(at07._2 > at08._2, s"expected a step between 0.7 and 0.8: $curve")
    // monotone: pairs and drops never increase with τ
    curve.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 >= b._2 && a._3 >= b._3)
    }
  }

  test("lshRecallCurve equals the independently-bucketed truth∩candidate counts on the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Dedup.lshRecallCurve(docs)
      .select("j_bucket", "n_pairs", "n_caught", "catch_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.nonEmpty)
    assert(got.forall { case (b, np, nc, cr) =>
      b >= 2 && np > 0 && nc >= 0 && nc <= np &&
        cr == math.round(nc.toDouble / np * 1e6) / 1e6 }, got.toSeq)
    // independent recomputation from the two public frames
    val truth = Dedup.ngramJaccardPairs(docs, 3, 0.1)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    val cand = Dedup.minhashLshPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val want = truth.groupBy(t => math.floor(t._3 * 20).toLong).map { case (b, ps) =>
      (b, ps.length.toLong, ps.count(p => cand((p._1, p._2))).toLong)
    }
    assert(got.map(g => (g._1, g._2, g._3)).toSet == want.toSet, want.toSeq.sortBy(_._1).mkString(","))
    // an exact-dup bucket (j = 1.0 → bucket 20) must be fully caught:
    // identical shingle sets hash to identical signatures
    got.find(_._1 == 20L).foreach { case (_, np, nc, _) => assert(nc == np) }
  }

  test("two-stage pair source recalls every exact pair on the real corpus") {
    // the keep/clusters/split chain rides the two-stage generator, so
    // its recall against the exact operator is load-bearing — and an
    // approximate operator can match its own oracle while silently
    // recalling nothing (the 0-rows-but-MATCH trap). Audited at sf0.1:
    // 256/256; pinned here on the spec corpus.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val two = Dedup.ngramJaccardTwoStage(docs)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = two.intersect(exact).size.toDouble / exact.size
    info(f"two-stage recall vs exact: $recall%.3f (${two.size}/${exact.size} pairs)")
    assert(recall >= 0.95, f"two-stage recall dropped to $recall%.3f")
  }

  test("source overlap matrix counts near-dup pairs symmetrically by source") {
    // docs 1/2/3 are exact dups (guaranteed LSH candidates — identical
    // signatures) spread over two sources; 4/5 unrelated. Pairs:
    // (1,2) web↔books, (1,3) web↔web, (2,3) books↔web →
    // matrix: (books,web)=2, (web,web)=1.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "web"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta", "books"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta", "web"),
      (4L, "totally unrelated content lives in this row", "web"),
      (5L, "other words that match nothing else at all", "books"))
      .toDF("doc_id", "text", "source")
    val src = docs.select(col("doc_id"), col("source"))
    val out = Dedup.ngramJaccardTwoStage(docs)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")), "doc_b")
      .groupBy(least(col("src_a"), col("src_b")).as("source_x"),
        greatest(col("src_a"), col("src_b")).as("source_y"))
      .agg(count(lit(1)).as("n_pairs"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("books", "web", 2L), ("web", "web", 1L)))
  }

  test("signature-agreement estimate: exact dups at 1.0, unrelated absent") {
    val p = Dedup.minhashEstimatedPairs(toyDocs)
      .select("doc_a", "doc_b", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(p.find(x => x._1 == 1L && x._2 == 4L).get._3 == 1.0)
    assert(!p.exists(x => x._1 == 5L || x._2 == 5L))
  }

  test("simhash: identical docs at hamming 0") {
    val p = Dedup.simhashPairs(toyDocs)
      .filter($"doc_a" === 1 && $"doc_b" === 4)
      .select("hamming").as[Long].collect()
    assert(p.toSeq == Seq(0L))
  }

  test("substringSpans: cross-doc repeated k-grams merge into maximal spans") {
    val docs = Seq(
      // docs 1 and 2 share the 5-token run "a b c d e" → 3-gram starts
      // at doc1 pos 1..3 (one island) and doc2 pos 3..5
      (1L, "a b c d e x y z"),
      (2L, "q r a b c d e s"),
      // doc 3 repeats the shared run twice with a gap > k between the
      // repeated-start runs → TWO islands: starts 1..3 and 10..12
      (3L, "a b c d e n1 n2 n3 n4 a b c d e"),
      // doc 4: internal-only repetition (no second doc) → no spans
      (4L, "m n o m n o m n o"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, 3)
      .select("doc_id", "span_start", "span_end", "n_rep_shingles")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(spans == Seq(
      (1L, 1L, 5L, 3L),
      (2L, 3L, 7L, 3L),
      (3L, 1L, 5L, 3L),
      (3L, 10L, 14L, 3L)))
  }

  test("substringSpans: overlapping spans from DIFFERENT partner docs merge") {
    // doc 5 shares "a b c" with doc 6 and "c d e" with doc 7 — the
    // repeated starts (1 and 3) are ≤ k apart, so doc 5 gets ONE
    // merged span even though no single partner shares the whole run
    val docs = Seq(
      (5L, "a b c d e"),
      (6L, "a b c p q"),
      (7L, "u c d e v"))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(docs, 3)
      .select("doc_id", "span_start", "span_end", "n_rep_shingles")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(spans == Seq(
      (5L, 1L, 5L, 2L),
      (6L, 1L, 3L, 1L),
      (7L, 2L, 4L, 1L)))
  }

  test("inflation: duplication report counts docs, clusters, and droppable tokens") {
    // docs 1,2 identical (10 tokens each); doc 3 unique (4 tokens).
    // keep-lowest-id keeps doc 1 → dedup would drop doc 2's 10 tokens
    val docs = Seq(
      (1L, "x y z w q r s t u v"),
      (2L, "x y z w q r s t u v"),
      (3L, "completely different short doc"))
      .toDF("doc_id", "text")
    val out = Dedup.inflation(docs)
      .select("n_docs", "n_clusters", "n_dup_docs", "n_tokens",
        "dup_tokens", "dup_doc_share", "dup_token_share")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().head
    assert(out._1 == 3L && out._2 == 2L && out._3 == 2L)
    assert(out._4 == 24L && out._5 == 10L)
    assert(math.abs(out._6 - 2.0 / 3) < 1e-12 && math.abs(out._7 - 10.0 / 24) < 1e-12)
  }

  test("substringApply: shared-span tokens counted out, span-free docs untouched") {
    val shared = "a b c d e f g h i j" // exactly one 10-gram
    val docs = Seq(
      (1L, s"$shared extra1 extra2"),
      (2L, s"$shared other1 other2"),
      (3L, "q r s t u v")) // < 10 tokens: no shingles at all
      .toDF("doc_id", "text")
    val r = Dedup.substringApply(docs, 10)
      .select("doc_id", "n_tokens", "n_rep_spans", "n_tokens_removed",
        "n_tokens_after", "removed_share")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, 12L, 1L, 10L, 2L, 10.0 / 12),
      (2L, 12L, 1L, 10L, 2L, 10.0 / 12),
      (3L, 6L, 0L, 0L, 6L, 0.0)), r)
  }

  test("bloomProfile: bits bound by k·n, duplicates add nothing, derived stats exact") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon zeta"))
      .toDF("doc_id", "text")
    val out = Dedup.bloomProfile(docs, nProbes = 500)
      .select("m", "k", "n_items", "bits_set", "occupancy", "fp_predicted",
        "n_probes", "n_probe_hits", "fp_measured")
      .as[(Long, Long, Long, Long, Double, Double, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out.map(r => (r._1, r._2)) == Seq((1024L, 2L), (4096L, 2L), (4096L, 4L), (65536L, 4L)))
    out.foreach { case (m, k, n, bits, occ, fpp, np, nh, fpm) =>
      assert(n == 3 && np == 500)
      assert(bits >= 1 && bits <= k * n, s"bits=$bits")
      assert(occ == bits.toDouble / m)
      val expFpp = if (k == 2) occ * occ else occ * occ * occ * occ
      assert(fpp == expFpp)
      assert(fpm == nh.toDouble / np)
      // 3-doc filter: a probe FP needs all k of its bits set by luck
      assert(nh <= 2, s"m=$m k=$k hits=$nh")
    }
    // duplicate text sets no new bits
    val dup = Dedup.bloomProfile(docs.union(Seq((4L, "alpha beta")).toDF("doc_id", "text")),
      nProbes = 1)
      .select("m", "k", "bits_set").as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    out.foreach { case (m, k, _, bits, _, _, _, _, _) =>
      assert(dup((m, k)) == bits, s"duplicate text changed bits for ($m,$k)")
    }
  }

  test("bloomApply: no false negatives ever; FP accounting exact at both filter sizes") {
    val corpus = (1L to 40L).map(i => (i, s"corpus document number $i body"))
      .toDF("doc_id", "text")
    // batch: 10 exact members + 10 guaranteed-novel texts
    val batch = ((1L to 10L).map(i => (100L + i, s"corpus document number $i body")) ++
      (1L to 10L).map(i => (200L + i, s"novel text $i never seen")))
      .toDF("doc_id", "text")
    val wide = Dedup.bloomApply(corpus, batch, mBits = 65536, kHashes = 4)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    val (nb, nd, nf, nc, nfp, fp) = wide
    assert(nb == 20 && nd == 10, wide)
    assert(nc == nd, s"FALSE NEGATIVE: caught $nc of $nd true dups") // Bloom theorem
    assert(nf == nc + nfp && fp == nfp.toDouble / (nb - nd))
    assert(nfp == 0, s"65536-bit filter on 40 items should not FP: $wide")
    // a saturated 16-bit filter: still zero false negatives, FPs expected
    val tiny = Dedup.bloomApply(corpus, batch, mBits = 16, kHashes = 2)
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(tiny._4 == tiny._2, s"false negative under saturation: $tiny")
    assert(tiny._5 > 0, s"16-bit filter over 40 items must saturate into FPs: $tiny")
  }

  test("lshTuning: candidates shrink as bands widen; truth fixed; theory bounded") {
    val docs = (1L to 12L).map { i =>
      val base = "the quick brown fox jumps over the lazy dog again and again"
      (i, if (i % 3 == 0) base else s"$base variant$i tail$i word$i")
    }.toDF("doc_id", "text")
    val out = Dedup.lshTuning(docs)
      .select("bands", "rows_per_band", "n_candidates", "n_true_pairs",
        "n_caught", "recall", "expected_caught")
      .as[(Int, Int, Long, Long, Long, Double, Double)]
      .collect().sortBy(-_._1).toSeq
    val nTrue = out.head._4
    assert(nTrue > 0, "fixture must produce verified pairs")
    out.foreach { r =>
      assert(r._4 == nTrue, "truth must not vary by config")
      assert(r._5 <= r._3 && r._5 <= nTrue && r._6 <= 1.0, r)
      assert(r._7 >= 0.0 && r._7 <= nTrue + 1e-9, r)
    }
    // wider bands (fewer of them) can only shed candidates
    assert(out.map(_._3) == out.map(_._3).sorted.reverse, out.map(_._3))
    // the loosest banding is a superset of every other config's catches
    assert(out.head._5 == out.map(_._5).max)
  }

  test("stop-shingle cap bounds join fan-out") {
    // every doc shares shingle "a a a"; with cap 2 the hot shingle is dropped
    val docs = (1L to 10L).map(i => (i, s"a a a unique$i token$i")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, 3, 0.0, maxShingleDf = 1000)
    val capped = Dedup.ngramJaccardPairs(docs, 3, 0.0, maxShingleDf = 2)
    assert(uncapped.count() == 45) // all pairs intersect on the hot shingle
    assert(capped.count() == 0)
  }

  test("editDistancePairs: identical prefixes read lev 0; a one-char edit reads 1") {
    // docs 1/2 share the whole text except one character inside the
    // 200-char prefix; doc 3 is unrelated (no candidate pair emitted)
    val base = "the quick brown fox jumps over the lazy dog again and again and again"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "hazy")),
      (3L, "completely different content with no overlap whatsoever here"))
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs)
      .select("doc_a", "doc_b", "lev", "max_len", "edit_sim")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L)
    assert(got.head._3 == 1L, s"lev: ${got.head}")
    assert(got.head._4 == base.length)
    assert(got.head._5 == 1.0 - 1.0 / base.length)
  }
}
