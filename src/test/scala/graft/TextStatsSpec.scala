package graft

import graft.text.TextOps
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "The quick brown fox, it jumps!"),
    (2L, "aaaa"),
    (3L, "el la de que los armamos una fiesta")).toDF("doc_id", "text")

  test("quality counts and ratios") {
    val q = TextOps.quality(docs).filter($"doc_id" === 1)
      .select("len", "n_tokens", "n_punct", "n_stop", "n_upper")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(q == ((30L, 6L, 2L, 2L, 1L))) // "the","it" stopwords; ','!' punct; 'T' upper
  }

  test("oovRate: instances outside the top-k vocab count as OOV; rate exact; non-vacuous on the corpus") {
    // top-2 vocab of this toy = {a, b} (a×4, b×3 beat c×2, d×1)
    val d = Seq((1L, "a b a c"), (2L, "a b b d"), (3L, "a c")).toDF("doc_id", "text")
    val r = TextOps.oovRate(d, vocabK = 2)
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq((1L, 4L, 1L, 0.25), (2L, 4L, 1L, 0.25), (3L, 2L, 1L, 0.5)), r)
    // the gated k=16 setting is non-vacuous on the real corpus
    val real = TextOps.oovRate(spark.read.parquet(s"$sfDir/documents.parquet"))
    assert(real.filter(col("n_oov") > 0).count() > 0)
  }

  test("heapsCurve: cumulative docs/tokens/distinct per id-prefix bucket; ttr exact") {
    // 4 docs, 2 buckets (ids 0,1 → b0; 2,3 → b1)
    val d = Seq(
      (0L, "a b c"), (1L, "a b"),      // prefix 1: 5 tokens, 3 distinct
      (2L, "c d"), (3L, "d e a"))      // full: 10 tokens, 5 distinct
      .toDF("doc_id", "text")
    val r = TextOps.heapsCurve(d, buckets = 2)
      .select("bucket", "n_docs", "n_tokens", "n_distinct", "ttr")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq((0L, 2L, 5L, 3L, 0.6), (1L, 4L, 10L, 5L, 0.5)), r)
  }

  test("langConfusion: cells count (true, pred) pairs, shares are per-true-language") {
    val d = Seq(
      (1L, "the cat and the dog of it", "en"),
      (2L, "el que los por con del", "en"),  // en doc that reads as es → off-diagonal
      (3L, "der und das ist nicht", "de"),
      (4L, "zzz qqq", "fr"))                 // nothing matches → unknown
      .toDF("doc_id", "text", "lang")
    val m = TextOps.langConfusion(d).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(m == Set(("en", "en", 1L, 0.5), ("en", "es", 1L, 0.5),
      ("de", "de", 1L, 1.0), ("fr", "unknown", 1L, 1.0)), m)
  }

  test("TokenRunCount == size(regexp tokens) on edges, unicode, and the real corpus") {
    // the native byte-scan must match the regex EXACTLY — it replaces
    // it in every counting site
    val edges = Seq(
      "", " ", "a", "a b", "  x9  ", "a1b2", "!!!", "a!b", "!a", "a!",
      "ümlaut ötto", "Σigma töken 42", "tab\tand\nnewline", "ALL CAPS",
      "mixed É case", "数字123abc", "a-b_c.d", "0", "00 11 22")
    val df = edges.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val cmp = df.select(
      TextOps.tokenCount($"text").as("fast"),
      size(TextOps.tokens($"text")).cast("long").as("ref"))
    assert(cmp.filter($"fast" =!= $"ref").count() == 0,
      cmp.collect().mkString(","))
    // and over every real document
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = corpus.select(
      TextOps.tokenCount($"text").as("fast"),
      size(TextOps.tokens($"text")).cast("long").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(bad.count() == 0)
    // interpreted eval agrees with the codegen path
    import graft.functions.TokenRunCount
    import org.apache.spark.sql.catalyst.expressions.Literal
    edges.foreach { t =>
      val viaEval = TokenRunCount(Literal(t.toLowerCase)).eval(null)
      val viaRegex = TextOps.TokenPattern.r.findAllIn(t.toLowerCase).length.toLong
      assert(viaEval == viaRegex, s"'$t': eval=$viaEval regex=$viaRegex")
    }
  }

  test("Md5Prefix == conv(substring(md5)) at 7 and 15 digits, edges + corpus") {
    // the native digest-prefix must be bit-identical to the composed
    // hex-string form it replaces (the oracle restates THAT form)
    val edges = Seq("", "a", "the quick brown fox", "ümlaut", "Σ", "123",
      "a" * 1000, "\u0000weird\u0001")
    val df = edges.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    Seq(7, 15).foreach { n =>
      val bad = df.select(
        graft.functions.Md5Prefix($"s", n).as("fast"),
        conv(substring(md5($"s"), 1, n), 16, 10).cast("long").as("ref"))
        .filter($"fast" =!= $"ref")
      assert(bad.count() == 0, s"n=$n: " + bad.collect().mkString(","))
    }
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
    val bad = corpus.select(
      graft.functions.Md5Prefix($"text", 15).as("fast"),
      conv(substring(md5($"text"), 1, 15), 16, 10).cast("long").as("ref"))
      .filter($"fast" =!= $"ref")
    assert(bad.count() == 0)
  }

  test("token counts: regex vs whitespace vs bpe-ish vs distinct") {
    val t = TextOps.tokenCounts(docs).filter($"doc_id" === 1)
      .select("n_tokens", "n_ws_tokens", "n_bpe_tokens", "n_distinct_tokens")
      .as[(Long, Long, Long, Long)].head()
    // bpe-ish: 6 words + "," + "!" = 8
    assert(t == ((6L, 6L, 8L, 6L)))
  }

  test("media feature extraction: normalized vectors flow into VectorOps") {
    val m = Multimodal.attachMedia(docs)
    val feats = Multimodal.features(m, dim = 8)
    val top = graft.vector.VectorOps.cosineTopK(feats, feats.filter($"vec_id" === 1), k = 2)
    assert(top.count() == 2)
    val norms = feats.select(graft.vector.VectorOps.norm($"v")).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
  }

  test("pmiBigrams: PMI matches a hand recompute; floor and total order hold") {
    val d = Seq((1L, "x y x y"), (2L, "z")).toDF("doc_id", "text")
    val r = TextOps.pmiBigrams(d, minCount = 1, k = 10)
      .select("term_a", "term_b", "c_ab", "pmi")
      .as[(String, String, Long, Double)].collect().toSeq
    def pmi(cab: Long, ca: Long, cb: Long, t2: Double, t1: Double) =
      math.round(math.log((cab.toDouble / t2) /
        ((ca.toDouble / t1) * (cb.toDouble / t1))) * 1e6) / 1e6.toDouble
    // unigrams x:2 y:2 z:1 (t1=5); bigrams "x y":2 "y x":1 (t2=3)
    assert(r == Seq(
      ("x", "y", 2L, pmi(2, 2, 2, 3.0, 5.0)),
      ("y", "x", 1L, pmi(1, 2, 2, 3.0, 5.0))), r)
    // the floor removes the hapax tail entirely here
    assert(TextOps.pmiBigrams(d, minCount = 2, k = 10).count() == 1)
  }

  test("sourceKl: per-source KL over vocab+OOV buckets matches a hand recompute; non-negative on the corpus") {
    // vocabK=1 → vocab {b} (corpus counts a=3, b=4); buckets b / __oov__
    val d = Seq((1L, "A", "a a b"), (2L, "B", "a b b b"))
      .toDF("doc_id", "source", "text")
    val r = TextOps.sourceKl(d, vocabK = 1)
      .select("source", "n_tokens", "kl").as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    def term(cs: Long, ns: Long, cq: Long, tot: Double) = {
      val p = cs.toDouble / ns.toDouble; val q = cq.toDouble / tot
      math.round(p * math.log(p / q) * 1e6) / 1e6
    }
    val klA = term(1, 3, 4, 7.0) + term(2, 3, 3, 7.0)
    val klB = term(3, 4, 4, 7.0) + term(1, 4, 3, 7.0)
    assert(r("A")._1 == 3L && math.abs(r("A")._2 - klA) < 1e-9, r)
    assert(r("B")._1 == 4L && math.abs(r("B")._2 - klB) < 1e-9, r)
    // on the real corpus: one row per source, KL ≥ 0 up to rounding
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = TextOps.sourceKl(docs0).select("source", "kl")
      .as[(String, Double)].collect()
    assert(corpus.length ==
      docs0.select("source").distinct().count().toInt && corpus.nonEmpty)
    corpus.foreach { case (s, kl) => assert(kl >= -1e-5, s"$s kl=$kl") }
  }

  test("imageDHash: decoded-pixel hashes equal the synthesis-formula recompute on the corpus") {
    val sf = spark.read.parquet(s"$sfDir/documents.parquet")
    val hx = Multimodal.imageDHash(Multimodal.attachMedia(sf))
      .select("doc_id", "dhash_hi", "dhash_lo").as[(Long, Long, Long)].collect()
    val texts = sf.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(hx.length == texts.keys.count(_ % 2 == 0) && hx.nonEmpty)
    def formulaHash(text: String): (Long, Long) = {
      val bytes = text.getBytes("UTF-8"); val len = bytes.length
      def b(i: Int) = if (len == 0) 120 else bytes(i % len) & 0xff
      val w = 16 + len % 32; val h = 8 + len % 16
      def gray(i: Int, j: Int) = {
        val x = i * w / 9; val y = j * h / 8; val c = b(x + y)
        ((c * 37) % 256 + (x * 7 + c) % 256 + (y * 11 + c) % 256) / 3
      }
      var lo = 0L; var hi = 0L
      for (j <- 0 until 8; i <- 0 until 8)
        if (gray(i + 1, j) > gray(i, j)) {
          val k = j * 8 + i
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
      (hi, lo)
    }
    hx.foreach { case (id, hi, lo) =>
      assert((hi, lo) == formulaHash(texts(id)), s"doc $id hash mismatch") }
  }

  test("imageStats: decoded-pixel luminance stats equal the synthesis-formula recompute") {
    val sf = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Multimodal.imageStats(Multimodal.attachMedia(sf))
      .select("doc_id", "width", "height", "n_pixels", "sum_gray",
        "min_gray", "max_gray", "mean_gray", "contrast")
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Long)].collect()
    val texts = sf.select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.length == texts.keys.count(_ % 2 == 0) && got.nonEmpty)
    got.foreach { case (id, w, h, np, sum, mn, mx, mean, contrast) =>
      val bytes = texts(id).getBytes("UTF-8"); val len = bytes.length
      def b(i: Int) = if (len == 0) 120 else bytes(i % len) & 0xff
      assert(w == 16 + len % 32 && h == 8 + len % 16 && np == w * h)
      val grays = for (y <- 0 until h.toInt; x <- 0 until w.toInt) yield {
        val c = b(x + y)
        ((c * 37) % 256 + (x * 7 + c) % 256 + (y * 11 + c) % 256) / 3
      }
      assert(sum == grays.map(_.toLong).sum && mn == grays.min && mx == grays.max,
        s"doc $id stats mismatch")
      assert(mean == sum.toDouble / np && contrast == mx - mn)
    }
  }

  test("imageEntropy: a constructed flat image flags, a uniform-histogram one reads the ln 8 ceiling") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(32, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 32) {
        val g = f(x, y); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out); out.toByteArray
    }
    val media = Seq(
      (1L, png((_, _) => 128), "image"),           // flat: one bin, H = 0
      (2L, png((x, _) => x * 8), "image"))         // 32 gray levels = 4 per bin: uniform
      .toDF("doc_id", "media", "kind")
    val out = Multimodal.imageEntropy(media)
      .select("doc_id", "n_pixels", "entropy", "flat")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._2) == Seq(256L, 256L))
    val (flat, uni) = (out.head, out(1))
    assert(flat._3 == 0.0 && flat._4, flat)
    // uniform over all 8 bins: H = ln 8 up to the 9dp term rounding
    assert(math.abs(uni._3 - math.log(8.0)) < 1e-6 && !uni._4, uni)
  }

  test("imageBlur: constant image reads lap_var 0 and flags; a checkerboard is sharp") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16) {
        val g = f(x, y); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out); out.toByteArray
    }
    val media = Seq(
      (1L, png((_, _) => 77), "image"),                          // defocused-flat
      (2L, png((x, y) => if ((x + y) % 2 == 0) 0 else 200), "image")) // max-contrast
      .toDF("doc_id", "media", "kind")
    val out = Multimodal.imageBlur(media)
      .select("doc_id", "n_interior", "lap_var", "blurry")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(out.map(_._2) == Seq(84L, 84L)) // (16−2)×(8−2) interior
    assert(out.head._3 == 0.0 && out.head._4, out.head.toString)
    // checkerboard: every interior Laplacian is ±4·200 = ±800 (all 4
    // neighbors sit on the opposite parity), and the 14×6 interior
    // splits the parities 42/42 → mean 0 exactly, variance 800²
    assert(out(1)._3 == 800.0 * 800.0 && !out(1)._4, out(1).toString)
  }

  test("imageSobel: flat reads 0/NULL; horizontal stripes are pure-Gy; verticals pure-Gx") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(16, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 16) {
        val g = f(x, y); img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out); out.toByteArray
    }
    val media = Seq(
      (1L, png((_, _) => 99), "image"),                       // flat
      (2L, png((_, y) => if (y < 4) 0 else 100), "image"),    // horizontal step
      (3L, png((x, _) => if (x < 8) 0 else 100), "image"))    // vertical step
      .toDF("doc_id", "media", "kind")
    val out = Multimodal.imageSobel(media)
      .select("doc_id", "n_interior", "sum_gx2", "sum_gy2", "grad_energy", "edge_ratio")
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect()
      .sortBy(_._1).toSeq
    assert(out.map(_._2) == Seq(84L, 84L, 84L))
    // flat: zero energy on both axes, ratio undefined -> NULL never Inf
    assert(out.head._3 == 0L && out.head._4 == 0L && out.head._5 == 0.0
      && out.head._6.isEmpty, out.head.toString)
    // horizontal step at y=4: the centered difference straddles the
    // edge only at y∈{3,4} -> |Gy| = 4·100 there, Gx = 0 everywhere
    // (rows constant): sum_gy2 = 2 rows × 14 x × 400²
    val hs = out(1)
    assert(hs._3 == 0L && hs._4 == 2L * 14L * 400L * 400L, hs.toString)
    assert(hs._6.contains(0.0), hs.toString)
    // vertical step at x=8: the transpose — pure Gx over x∈{7,8} ×
    // 6 interior rows; ratio NULL (Gy2 = 0)
    val vs = out(2)
    assert(vs._3 == 2L * 6L * 400L * 400L && vs._4 == 0L && vs._6.isEmpty,
      vs.toString)
  }

  test("dhashNearDupPairs: banded candidates find every pair within hamming 3, none beyond") {
    // constructed 90×80 images: each 10×10 block holds one sampled
    // grid cell (x = i·90/9 = i·10), so the hash bits are controlled
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(grid: Array[Array[Int]]): Array[Byte] = {
      val img = new BufferedImage(90, 80, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 80; x <- 0 until 90) {
        val g = grid(y / 10)(x / 10)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out); out.toByteArray
    }
    val base = Array.fill(8)(Array.tabulate(9)(i => if (i % 2 == 0) 0 else 100))
    val near = base.map(_.clone); near(0)(1) = 0          // flips bit 0 only
    val far = base.map(_.clone)                            // flips 8 bits (row 0+1 inverted)
    for (r <- 0 until 2; i <- 0 until 9) far(r)(i) = if (i % 2 == 0) 100 else 0
    val media = Seq(
      (0L, png(base), "image"), (2L, png(base.map(_.clone)), "image"),
      (4L, png(near), "image"), (6L, png(far), "image"))
      .toDF("doc_id", "media", "kind")
    val hashes = Multimodal.imageDHash(media)
    val pairs = Multimodal.dhashNearDupPairs(hashes, 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((0L, 2L, 0L), (0L, 4L, 1L), (2L, 4L, 1L)), pairs)
    // brute-force cross-check from the collected hashes
    val hs = hashes.select("doc_id", "dhash_hi", "dhash_lo")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val bf = (for {
      a <- hs; b <- hs if a._1 < b._1
      d = java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
      if d <= 3
    } yield (a._1, b._1, d.toLong)).toSet
    assert(pairs == bf, s"banded=$pairs brute=$bf")
    val e = intercept[IllegalArgumentException] {
      Multimodal.dhashNearDupPairs(hashes, 4) }
    assert(e.getMessage.contains("hamming 3"), e.getMessage)
  }

  test("audioFeatures: real WAV decode, hand-computed RMS and zero-crossings") {
    // doc 1: text "a" → every sample = ('a'−96)·250 = 250, constant
    // positive → zero crossings 0, rms exactly 250
    // doc 3: "a?" → samples alternate 250, ('?'−96)·250 = −8250 →
    // every within-window adjacent pair crosses
    val d = Seq((1L, "a"), (3L, "a?")).toDF("doc_id", "text")
    val f = Multimodal.audioFeatures(Multimodal.attachMedia(d))
      .select("doc_id", "window_idx", "n_samples", "n_zero_cross", "rms")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(f.length == 8) // 2 audio docs × 4 windows
    val d1 = f.filter(_._1 == 1L)
    assert(d1.map(_._3).sum == 256 + 7 % 1024) // n = 263 samples total
    d1.foreach { case (_, _, _, zc, rms) => assert(zc == 0L && rms == 250.0) }
    val d3 = f.filter(_._1 == 3L)
    assert(d3.map(_._3).sum == 256 + 14 % 1024) // 270
    d3.foreach { case (_, _, n, zc, rms) =>
      assert(zc == n - 1, s"alternating signal must cross at every within-window pair")
      // rms² = mean of the window's {250², 8250²} mixture — bounded by
      // the pure tones on either side
      assert(rms > 250.0 && rms < 8250.0)
    }
  }

  test("redact strips emails and id-numbers with typed placeholders") {
    // the shipped corpus has NO pii (verified: 0 docs match either
    // pattern), so the oracle hash-match alone cannot prove redaction
    // works — this constructed input is the actual evidence
    val pii = Seq(
      (1L, "contact bob.smith+x@corp-mail.co.uk or call 12345678 now"),
      (2L, "clean text, short num 12345 stays"))
      .toDF("doc_id", "text")
    val byId = TextOps.redact(pii).collect().map(x => x.getLong(0) ->
      (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(byId(1L) == ((1L, 1L, "contact [EMAIL] or call [NUM] now")))
    assert(byId(2L) == ((0L, 0L, "clean text, short num 12345 stays"))) // <6 digits untouched
  }

  test("repetition: a looping doc scores near 1, varied text scores low") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "every word here is completely different always"))
      .toDF("doc_id", "text")
    val r = TextOps.repetition(d).select("doc_id", "rep_ratio")
      .as[(Long, Double)].collect().toMap
    assert(r(1L) == 1.0)     // all 3-grams identical
    assert(r(2L) < 0.3)      // no repeated 3-gram
  }

  test("real resize: decoded dims shrink to fit; audio keeps a sample prefix") {
    val m = Multimodal.attachMedia(docs)
    val resized = Multimodal.resizeMedia(m, maxDim = 8)
    assert(resized.count() == docs.count())
    val dims = Multimodal.decodeMeta(resized)
      .select("doc_id", "kind", "width", "height", "n_samples")
      .as[(Long, String, Long, Long, Long)].collect()
    dims.foreach {
      case (_, "image", w, h, _) => assert(w <= 8 && h <= 8 && w >= 1 && h >= 1)
      case (_, _, _, _, n) => assert(n <= 800 && n > 0) // maxDim*100 samples
    }
  }

  test("frame-sample: audio frames are real WAV windows preserving every sample") {
    val m = Multimodal.attachMedia(docs)
    val frames = Multimodal.frameSample(m, nFrames = 4)
    assert(frames.count() == docs.count() * 4)
    // every audio frame must itself decode as WAV, and the windows
    // must partition the original clip exactly (no sample lost)
    val audioTotals = frames.join(m.select("doc_id", "kind"), "doc_id")
      .filter($"kind" === "audio")
      .select("doc_id", "frame")
      .as[(Long, Array[Byte])].collect()
      .groupBy(_._1).map { case (id, fs) =>
        id -> fs.map { case (_, bytes) =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val n = in.getFrameLength; in.close(); n
        }.sum
      }
    val expected = Multimodal.decodeMeta(m).filter($"kind" === "audio")
      .select("doc_id", "n_samples").as[(Long, Long)].collect().toMap
    audioTotals.foreach { case (id, total) => assert(total == expected(id)) }

    // image "frames" are REAL tiled crops: each decodes as a full-width
    // PNG strip, and the strips partition the original height exactly
    val imgDims = Multimodal.decodeMeta(m).filter($"kind" === "image")
      .select("doc_id", "width", "height").as[(Long, Long, Long)].collect()
      .map { case (id, w, h) => id -> ((w, h)) }.toMap
    val imgStrips = frames.join(m.select("doc_id", "kind"), "doc_id")
      .filter($"kind" === "image")
      .select("doc_id", "frame")
      .as[(Long, Array[Byte])].collect()
      .map { case (id, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        (id, img.getWidth.toLong, img.getHeight.toLong)
      }
    assert(imgStrips.nonEmpty)
    imgStrips.groupBy(_._1).foreach { case (id, strips) =>
      val (w, h) = imgDims(id)
      assert(strips.forall(_._2 == w), s"doc $id strip width != image width")
      assert(strips.map(_._3).sum == h, s"doc $id strips don't tile the height")
    }
  }

  test("imageColorfulness: grayscale reads 0; a constant red/blue field matches the closed form") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, f(x, y))
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out); out.toByteArray
    }
    val gray = (g: Int) => (g << 16) | (g << 8) | g
    val media = Seq(
      (1L, png((x, y) => gray((x * 13 + y * 7) % 256)), "image"), // varied grayscale
      (2L, png((_, _) => 0xff0000), "image"))                     // pure red
      .toDF("doc_id", "media", "kind")
    val got = Multimodal.imageColorfulness(media)
      .select("doc_id", "n_pixels", "colorfulness")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // grayscale: R=G=B -> rg = yb = 0 everywhere -> M = 0 exactly
    assert(got.head == ((1L, 64L, 0.0)), got.head.toString)
    // pure red: rg = 255, yb2 = 255 constant -> variances 0,
    // M = 0.3 * sqrt(255^2 + 127.5^2)
    val m = 0.3 * math.sqrt(255.0 * 255.0 + 127.5 * 127.5)
    assert(math.abs(got(1)._3 - m) < 1e-9, s"${got(1)} vs $m")
  }

  test("vocabOverlap: shared vs disjoint source vocabularies, zero-overlap pair reports") {
    val d = Seq(
      (1L, "A", "alpha beta gamma"),
      (2L, "B", "alpha beta delta"),
      (3L, "C", "zz yy xx"))
      .toDF("doc_id", "source", "text")
    val got = TextOps.vocabOverlap(d, k = 10)
      .select("source_a", "source_b", "n_a", "n_b", "n_inter", "jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got(("A", "B")) == (("A", "B", 3L, 3L, 2L, 0.5)))
    assert(got(("A", "C")) == (("A", "C", 3L, 3L, 0L, 0.0)))
    assert(got(("B", "C")) == (("B", "C", 3L, 3L, 0L, 0.0)))
  }

  test("entropyRate: a one-token template reads 0 everywhere; a varied source reads H2 > H1") {
    val d = Seq(
      (1L, "T", "x x x x x"),            // one token: H1 = H2 = cond = 0
      (2L, "V", "a b a c a b d a"))      // varied
      .toDF("doc_id", "source", "text")
    val got = TextOps.entropyRate(d)
      .select("source", "n_tokens", "h_unigram", "n_bigrams", "h_bigram", "h_cond")
      .as[(String, Long, Double, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("T") == (("T", 5L, 0.0, 4L, 0.0, 0.0)), got("T"))
    val v = got("V")
    assert(v._2 == 8 && v._4 == 7)
    assert(v._3 > 0 && v._5 > v._3, v.toString)
    assert(math.abs(v._6 - (v._5 - v._3)) < 1e-12)
  }

  test("lengthGini: equal lengths read 0; concentration matches the hand formula") {
    val eq = Seq((1L, "x", 10L), (2L, "y", 10L), (3L, "z", 10L))
      .toDF("doc_id", "text", "n_chars")
    val g0 = graft.text.TextOps.lengthGini(eq)
      .select("n_docs", "total_chars", "gini")
      .as[(Long, Long, Double)].head()
    assert(g0 == ((3L, 30L, 0.0)), g0)
    // lengths 1,1,1,97: ranks (2,2,2,4) avg-tied; 2*sum(r*x) = 2*(2*3+4*97)
    val sk = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L), (4L, "d", 97L))
      .toDF("doc_id", "text", "n_chars")
    val g1 = graft.text.TextOps.lengthGini(sk)
      .select("gini").as[Double].head()
    val expected = (2.0 * (2 * 3 + 4 * 97)) / (4.0 * 100.0) - 5.0 / 4.0
    assert(g1 == expected, s"$g1 vs $expected")
  }

  test("audioClipping: rail counts follow the synthesis closed form") {
    // text "a z": samples cycle (250, -16000, 6500); n = 256+21 = 277;
    // only the space crosses |s| >= 15000 -> indices i%3==1: 92 of 277
    val d = Seq((1L, "a z")).toDF("doc_id", "text")
    val m = Multimodal.attachMedia(d).filter($"kind" === "audio")
    val got = Multimodal.audioClipping(m)
      .select("doc_id", "n_samples", "n_clipped", "max_abs", "clip_ratio")
      .as[(Long, Long, Long, Long, Double)].head()
    val n = 256 + ("a z".length * 7) % 1024
    val clipped = (0 until n).count(i => "a z".charAt(i % 3) == ' ')
    assert(got._2 == n && got._3 == clipped, got)
    assert(got._4 == 16000L)
    assert(got._5 == clipped.toDouble / n)
  }

  test("langId picks marker-majority language, unknown when silent") {
    val l = TextOps.langId(docs).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(l(1L) == "en")
    assert(l(2L) == "unknown")
    assert(l(3L) == "es")
  }

  test("fingerprint is stable and length-gated") {
    val f1 = TextOps.fingerprint(docs).count()
    assert(f1 == 2) // "aaaa" (len 4) is below the 5-char shingle gate
    val short = Seq((9L, "abc")).toDF("doc_id", "text")
    assert(TextOps.fingerprint(short).count() == 0)
  }

  test("novelty: corpus-unique 8-gram fraction, short docs emit nothing") {
    // doc 1 and 2 share their first 8-gram (identical first 8 tokens);
    // every other gram is unique. doc 3 is too short for any 8-gram.
    val shared = "a b c d e f g h"
    val corpus = Seq(
      (1L, s"$shared i j"),   // grams: [a..h], [b..i], [c..j] -> 3 grams, 2 unique
      (2L, s"$shared z"),     // grams: [a..h], [b..z] -> 2 grams, 1 unique
      (3L, "x y z")).toDF("doc_id", "text")
    val out = TextOps.novelty(corpus)
      .select("doc_id", "n_grams", "n_unique", "novelty")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 2L, 2.0 / 3),
      (2L, 2L, 1L, 0.5)))
  }

  test("mixWeights: alpha-tempered source mixture, hand-computed") {
    val corpus = Seq(
      (1L, "a b c d", "srcA"), (2L, "e f g h", "srcA"), // 8 tokens
      (3L, "x", "srcB"))                                 // 1 token
      .toDF("doc_id", "text", "source")
    val out = TextOps.mixWeights(corpus, alpha = 0.5)
      .select("source", "n_docs", "n_tokens", "weight")
      .as[(String, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // w(srcA) = 8^0.5 = 2.828427, w(srcB) = 1 -> weights over 3.828427
    val wa = BigDecimal(math.round(math.sqrt(8.0) * 1e6)) / 1e6
    val tot = (wa + 1).toDouble
    assert(out.map(t => (t._1, t._2, t._3)) == Seq(("srcA", 2L, 8L), ("srcB", 1L, 1L)))
    assert(math.abs(out(0)._4 - wa.toDouble / tot) < 1e-12)
    assert(math.abs(out(1)._4 - 1.0 / tot) < 1e-12)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12)
    // alpha=0 is uniform regardless of size
    val uni = TextOps.mixWeights(corpus, alpha = 0.0)
      .select("weight").as[Double].collect().toSeq
    assert(uni.forall(w => math.abs(w - 0.5) < 1e-12))
  }

  test("budgetAlloc: proportional fill, saturation cap, one redistribution round") {
    // srcA 8 tokens, srcB 1 token; α=0.5 → w = (2.828427, 1.0),
    // T = 3.828427
    val corpus = Seq(
      (1L, "a b c d", "srcA"), (2L, "e f g h", "srcA"),
      (3L, "x", "srcB"))
      .toDF("doc_id", "text", "source")
    def run(budget: Long): Map[String, (Long, Long, Double, Double)] =
      TextOps.budgetAlloc(corpus, budget, alpha = 0.5)
        .select("source", "avail_tokens", "alloc_tokens", "share", "fill_ratio")
        .as[(String, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val wa = math.rint(math.sqrt(8.0) * 1e6) / 1e6
    val T = wa + 1.0
    // budget 6: srcB's target floor(6·1/T)=1 saturates it exactly
    // (fill 1.0); srcA takes floor(6·wa/T)=4 then the leftover 1 in
    // the redistribution round (sole unsaturated source) → 5 of 8
    val b6 = run(6)
    assert(b6("srcB") == ((1L, 1L, 1.0 / 6, 1.0)), b6("srcB").toString)
    val a1 = math.floor(6.0 * (wa / T)).toLong // 4
    assert(a1 == 4L)
    assert(b6("srcA")._2 == 5L && b6("srcA")._4 == 5.0 / 8, b6("srcA").toString)
    // budget 100 > corpus: every source exhausts, nothing blows up on
    // the all-saturated (tw2 = null) redistribution edge
    val b100 = run(100)
    assert(b100("srcA") == ((8L, 8L, 0.08, 1.0)))
    assert(b100("srcB") == ((1L, 1L, 0.01, 1.0)))
    // zero budget refuses typed (ANSI division contract)
    intercept[IllegalArgumentException](run(0))
  }

  test("commonness: mean corpus df of each doc's distinct tokens") {
    val corpus = Seq((1L, "x y"), (2L, "x z"), (3L, "x x q")).toDF("doc_id", "text")
    val out = TextOps.commonness(corpus)
      .select("doc_id", "n_distinct_terms", "sum_df", "mean_df")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // df: x=3 (doc3's repeat counts once), y=1, z=1, q=1
    assert(out == Seq(
      (1L, 2L, 4L, 2.0),
      (2L, 2L, 4L, 2.0),
      (3L, 2L, 4L, 2.0)))
  }

  test("unigramLogprob: exact hand-computed score on a tiny corpus") {
    // corpus: "a a b" + "b c" → tf: a=2, b=2, c=1, N=5
    val tiny = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.unigramLogprob(tiny)
      .select("doc_id", "n_tokens", "mean_logprob")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    def lp(tf: Long) = math.rint(math.log(tf / 5.0) * 1e6) / 1e6
    assert(out.map(_._2) == Seq(3L, 2L))
    // doc1 = (2·lp(2) + lp(2)) / 3, doc2 = (lp(2) + lp(1)) / 2
    assert(math.abs(out(0)._3 - (3 * lp(2)) / 3) < 1e-12)
    assert(math.abs(out(1)._3 - (lp(2) + lp(1)) / 2) < 1e-12)
    // the CCNet ranking: common-vocab doc scores above the rarer one
    assert(out(0)._3 > out(1)._3)
  }

  test("bigramLogprob: exact transitions on a tiny corpus, short docs emit nothing") {
    // corpus "a b a b" + "b a": c(a)=3, c(b)=3; c(a,b)=2, c(b,a)=2
    val tiny = Seq((1L, "a b a b"), (2L, "b a"), (3L, "x")).toDF("doc_id", "text")
    val out = TextOps.bigramLogprob(tiny)
      .select("doc_id", "n_transitions", "mean_logprob")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val lp = math.rint(math.log(2.0 / 3.0) * 1e6) / 1e6
    assert(out.map(r => (r._1, r._2)) == Seq((1L, 3L), (2L, 1L))) // doc 3: no row
    assert(math.abs(out(0)._3 - lp) < 1e-12 && math.abs(out(1)._3 - lp) < 1e-12)
  }

  test("tokenEntropy: exact hand-check; looping doc scores zero") {
    val tiny = Seq((1L, "a a b"), (2L, "a a a a"), (3L, "x y z")).toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(tiny)
      .select("doc_id", "n_tokens", "entropy")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    def lp(c: Long, l: Long) = math.rint(math.log(c.toDouble / l) * 1e6) / 1e6
    val h1 = -(2 * lp(2, 3) + 1 * lp(1, 3)) / 3
    assert(out.map(_._2) == Seq(3L, 4L, 3L))
    assert(math.abs(out(0)._3 - h1) < 1e-12)
    assert(out(1)._3 == 0.0) // single repeated token: zero entropy
    assert(math.abs(out(2)._3 - (-lp(1, 3))) < 1e-12) // uniform: ln 3
    assert(out(2)._3 > out(0)._3 && out(0)._3 > out(1)._3) // diversity orders
  }

  test("vocabTopK: count-desc then term-asc, k bound") {
    val corpus = Seq((1L, "b b b a a c"), (2L, "a d")).toDF("doc_id", "text")
    val top = TextOps.vocabTopK(corpus, 3)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 3L), ("b", 3L), ("c", 1L))) // a before b on tie; d cut
  }

  test("qualityGate: each signal can independently fail a doc") {
    val pass = "the cat sat on a mat and the dog ran to the park with a ball for fun today again"
    val shortDoc = "the tiny one"
    val noStop = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val repeaty = ("the spam ham " * 12) + "the end"
    val g = TextOps.qualityGate(
      Seq((1L, pass), (2L, shortDoc), (3L, noStop), (4L, repeaty)).toDF("doc_id", "text"))
      .select("doc_id", "len_ok", "stop_ok", "rep_ok", "passed")
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(g(1L) == ((1L, true, true, true, true)))      // 20 varied tokens
    assert(g(2L) == ((2L, false, true, false, false)))   // short; 1 shingle ⇒ rep 1.0
    assert(g(3L) == ((3L, true, false, true, false)))    // zero stopwords
    assert(g(4L) == ((4L, true, true, false, false)))    // dominated by one 3-gram
  }

  test("real codecs roundtrip: PNG dims and WAV sample counts match the formulas") {
    val m = Multimodal.decodeMeta(Multimodal.attachMedia(docs))
      .select("doc_id", "kind", "width", "height", "sample_rate", "n_samples")
      .as[(Long, String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 2: "aaaa" (4 bytes, even id) → PNG 16+4%32 × 8+4%16, really
    // encoded by ImageIO and really parsed back
    assert(m(2L) == ((2L, "image", 20L, 12L, 0L, 0L)))
    // doc 1: 30 bytes, odd id → WAV with 256+(30*7)%1024 samples @8kHz
    assert(m(1L) == ((1L, "audio", 0L, 0L, 8000L, 256L + 210L)))
  }

  test("winnow: shared ≥ w+k−1 token run guarantees a shared fingerprint; ties pick rightmost") {
    // docs 1,2 share a 6-token run (= w+k−1 at k=3, w=4) in different
    // surrounding context — the winnowing guarantee promises at least
    // one common selected gram hash
    val docs = Seq(
      (1L, "p q r one two three four five six z"),
      (2L, "a b one two three four five six c d"),
      (3L, "entirely unrelated vocabulary here now"))
      .toDF("doc_id", "text")
    val fp = TextOps.winnow(docs)
      .select("doc_id", "pos", "gram_hash")
      .as[(Long, Long, Long)].collect()
    val byDoc = fp.groupBy(_._1).map { case (d, rs) => d -> rs.map(_._3).toSet }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty, "shared run produced no shared fingerprint")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    // positions are valid gram positions (8 tokens → grams 0..7)
    assert(fp.forall(r => r._2 >= 0 && r._2 <= 7))
    // all-equal hashes: every window's rightmost position is selected
    val ties = Seq((9L, "a a a a a a")).toDF("doc_id", "text")
    val sel = TextOps.winnow(ties).select("pos").as[Long].collect().toSet
    assert(sel == Set(0L, 1L, 2L, 3L), s"rightmost-tie selection broke: $sel")
  }

  test("zipfAlpha: an exact 1/rank frequency profile fits alpha = 1") {
    // counts 12, 6, 4, 3 at ranks 1..4 = 12/rank — a pure power law
    // with exponent 1
    val words = Seq.fill(12)("aa") ++ Seq.fill(6)("bb") ++ Seq.fill(4)("cc") ++ Seq.fill(3)("dd")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.zipfAlpha(docs)
      .select("n_terms", "alpha").as[(Long, Double)].collect().head
    assert(out._1 == 4L)
    assert(math.abs(out._2 - 1.0) < 1e-4, s"alpha = ${out._2}")
  }

  test("qualitySweep: reverse-cumulative survival per stopword-ratio bucket") {
    val docs = Seq(
      (1L, "the cat"),                                          // ratio 0.5  → bucket 10
      (2L, "cat dog"),                                          // ratio 0    → bucket 0
      (3L, "the the cat dog cat dog cat dog cat dog"))          // ratio 0.2  → bucket 4
      .toDF("doc_id", "text")
    val out = TextOps.qualitySweep(docs)
      .select("bucket", "docs_surviving", "tokens_surviving")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 3L, 14L), (4L, 2L, 12L), (10L, 1L, 2L)), out)
  }

  test("pack: per-shard running offsets, boundary straddle, zero-token drop") {
    // one shard (mod 1): docs of 3, 4, 5 tokens under budget 6 —
    // doc 3 (5 tokens at offset 7) straddles the 6|12 boundary
    val docs = Seq(
      (1L, "a b c"),
      (2L, "d e f g"),
      (3L, "h i j k l"),
      (4L, "!!! ???")) // zero alphanumeric tokens → drops
      .toDF("doc_id", "text")
    val got = TextOps.pack(docs, budget = 6, shards = 1)
      .select("doc_id", "shard", "n_tokens", "start_off", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0L, 3L, 0L, 0L, 0L),
      (2L, 0L, 4L, 3L, 0L, 1L), // tokens 3..6 straddle the first cut
      (3L, 0L, 5L, 7L, 1L, 1L)), got)
    // two shards: offsets restart per shard (odd docs pack separately)
    val sharded = TextOps.pack(docs, budget = 6, shards = 2)
      .select("doc_id", "start_off").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(sharded == Seq((1L, 0L), (2L, 0L), (3L, 3L)), sharded)
  }

  test("chunkSpans: sliding windows with overlap, clipped tail, token-exact hashes") {
    // 10 tokens, size 4, overlap 1 → stride 3 → exactly 3 windows
    // [t0..t3][t3..t6][t6..t9] — the last window REACHES the doc end,
    // so no redundant overlap-only tail is emitted; 9 tokens would
    // clip the last window to 3 (doc 4 below)
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "only three words"),
      (3L, "!!!"), // zero tokens → no chunks
      (4L, "a b c d e f g h i"))
      .toDF("doc_id", "text")
    val out = TextOps.chunkSpans(docs, size = 4, overlap = 1)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens", "chunk_hash")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(r => (r._2, r._3, r._4)) ==
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)), d1.toString)
    // hashes are the md5 of the space-joined slices — spot-check
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(d1(0)._5 == m("a b c d"))
    assert(d1(2)._5 == m("g h i j"))
    // the 9-token doc clips its final window to 3 tokens
    val d4 = out.filter(_._1 == 4L)
    assert(d4.map(r => (r._3, r._4)) == Seq((0L, 4L), (3L, 4L), (6L, 3L)), d4.toString)
    assert(d4.last._5 == m("g h i"))
    // a short doc is one clipped chunk; zero-token docs vanish
    assert(out.filter(_._1 == 2L).map(r => (r._3, r._4)) == Seq((0L, 3L)))
    assert(!out.exists(_._1 == 3L))
    // every token of every doc is covered: window spans are contiguous
    // with exactly `overlap` shared tokens until the final clip
    d1.sliding(2).foreach { case Seq(a, b) => assert(a._3 + a._4 - b._3 == 1L) }
    // degenerate parameters refuse
    intercept[IllegalArgumentException](TextOps.chunkSpans(docs, 4, 4))
  }

  test("packBins: bins partition every token, only the final bin underfills") {
    // same 3+4+5=12 tokens on one shard, budget 6 → exactly two FULL
    // bins; doc 2 straddles (counted in both), doc 3 sits in bin 1
    val docs = Seq(
      (1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l"))
      .toDF("doc_id", "text")
    val bins = TextOps.packBins(docs, budget = 6, shards = 1)
      .select("shard", "bin", "n_docs", "n_tokens", "fill_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._2).toSeq
    assert(bins == Seq((0L, 0L, 2L, 6L, 1.0), (0L, 1L, 2L, 6L, 1.0)), bins)
    // budget 5 → 12 tokens = 2 full bins + a 2-token tail bin
    val tail = TextOps.packBins(docs, budget = 5, shards = 1)
      .select("bin", "n_tokens", "fill_ratio")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(tail.map(_._2) == Seq(5L, 5L, 2L), tail)
    assert(tail.last._3 == 0.4 && tail.init.forall(_._3 == 1.0))
    // conservation: bin token sums equal the packed total
    assert(tail.map(_._2).sum == 12L)
  }

  test("tokenizerFertility: hand counts per source, punctuation inflates fertility") {
    val docs = Seq(
      (1L, "hello world", "a", 11L),        // ws 2, bpe 2
      (2L, "it's x-ray, ok?", "b", 15L))    // ws 3, bpe: it|'|s|x|-|ray|,|ok|? = 9
      .toDF("doc_id", "text", "source", "n_chars")
    val r = TextOps.tokenizerFertility(docs)
      .select("source", "n_docs", "n_ws_tokens", "n_bpe_tokens", "n_chars",
        "fertility", "chars_per_token")
      .as[(String, Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      ("a", 1L, 2L, 2L, 11L, 1.0, 5.5),
      ("b", 1L, 3L, 9L, 15L, 3.0, 15.0 / 9)), r)
  }

  test("driftKl: identical deciles score zero, a diverged tail scores positive") {
    // ids 0..9 → two docs per bucket at buckets=5; buckets 0-3 all
    // share the corpus-typical text, bucket 4 (ids 8,9) is pure OOV-ish
    // divergence → its KL must dominate
    val docs = ((0L to 7L).map(i => (i, "alpha beta gamma")) ++
      Seq((8L, "zzz yyy xxx"), (9L, "zzz yyy xxx"))).toDF("doc_id", "text")
    val r = TextOps.driftKl(docs, buckets = 5, vocabK = 3)
      .select("decile", "n_tokens", "kl")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(r.map(_._1) == (0L to 4L), r)
    assert(r.forall(_._2 == 6L))
    // deciles 0-3 have the same distribution as each other; the last
    // decile diverges hardest
    assert(r.init.map(_._3).distinct.size == 1, r)
    assert(r.last._3 > r.head._3, r)
  }

  test("dsirWeights: target-typical docs score above raw-typical ones, hand formula holds") {
    // target (tgt=true) speaks "alpha", raw background speaks "beta";
    // a fresh doc of pure alpha must outweigh a fresh doc of pure beta
    val docs = Seq(
      (1L, "alpha alpha alpha", "src1"),
      (2L, "beta beta beta", "src9"),
      (3L, "alpha alpha", "src9"),   // target-typical text, raw source
      (4L, "beta beta", "src9"))
      .toDF("doc_id", "text", "source")
    val B = 16
    val r = TextOps.dsirWeights(docs, col("source") === "src1", buckets = B)
      .select("doc_id", "n_tokens", "dsir_weight", "w_per_token")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(r.map(_._2).toSeq == Seq(3L, 3L, 2L, 2L))
    // hand model: Ct=3 (all alpha), Cr=10; alpha cr=5, beta cr=5
    def r6(x: Double) = math.round(x * 1e6) / 1e6.toDouble
    val lrAlpha = r6(math.log(4.0 / (3 + B)) - math.log(6.0 / (10 + B)))
    val lrBeta = r6(math.log(1.0 / (3 + B)) - math.log(6.0 / (10 + B)))
    val byId = r.map(x => x._1 -> x._3).toMap
    assert(math.abs(byId(3L) - 2 * lrAlpha) < 1e-9, s"${byId(3L)} vs ${2 * lrAlpha}")
    assert(math.abs(byId(4L) - 2 * lrBeta) < 1e-9, s"${byId(4L)} vs ${2 * lrBeta}")
    assert(byId(3L) > byId(4L) && byId(1L) > byId(2L))
    // per-token weight = weight / n_tokens (6dp)
    r.foreach { case (_, n, w, wpt) => assert(math.abs(wpt - r6(w / n)) < 1e-9) }
  }

  test("lshBucketStats: per-band occupancy and the exact implied pair count") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "completely different words entirely here now today"))
      .toDF("doc_id", "text")
    val st = graft.text.Dedup.lshBucketStats(docs)
      .select("band", "n_buckets", "n_colliding_buckets", "max_bucket", "n_candidate_pairs")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(st.map(_._1) == Seq(0, 1, 2, 3))
    // identical docs share EVERY band bucket: each band sees the (1,2)
    // collision and nothing else → 2 buckets (pair + singleton), one
    // colliding, max 2, exactly 1 implied pair
    st.foreach { case (_, nb, nc, mx, np) =>
      assert(nb == 2L && nc == 1L && mx == 2L && np == 1L, st.toString)
    }
  }

  test("lengthBatching: bucketed batches pad less; accounting exact on a hand corpus") {
    // bucket width 16: lengths 2,3 land in bucket 0; 20,21 in bucket 1.
    // bucketed batches (size 2, by length): [2,3] pad 1; [20,21] pad 1
    //   → padded = 2*3 + 2*21 = 48, real = 46, waste = 2/48
    // arrival (doc_id div 2) interleaves: [2,20] pad 18; [3,21] pad 18
    //   → padded = 2*20 + 2*21 = 82, waste = 36/82
    val docs = Seq(
      (0L, "a a"), (1L, "b b b b b b b b b b b b b b b b b b b b"),
      (2L, "c c c"), (3L, "d d d d d d d d d d d d d d d d d d d d d"))
      .toDF("doc_id", "text")
    val out = TextOps.lengthBatching(docs, bucketWidth = 16, batchSize = 2)
      .as[(Long, Long, Long, Double, Long, Double, Double)].head()
    assert(out._1 == 4L && out._2 == 46L, out)
    assert(out._3 == 2L && out._5 == 2L, out)
    assert(out._4 == 2.0 / 48 && out._6 == 36.0 / 82, out)
    assert(out._7 == 36.0 / 82 - 2.0 / 48, out)
  }

  test("vocabCoverage: exact shares, vocab-exhaustion plateau, deterministic ties") {
    // freqs: a×4, b×2, c×1, d×1 (c before d on the term tiebreak)
    val docs = Seq((1L, "a a a a b b c d")).toDF("doc_id", "text")
    val out = TextOps.vocabCoverage(docs, ks = Seq(1, 2, 3, 8))
      .select("k", "n_terms", "covered_tokens", "total_tokens", "coverage")
      .as[(Int, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1, 1L, 4L, 8L, 0.5),
      (2, 2L, 6L, 8L, 0.75),
      (3, 3L, 7L, 8L, 7.0 / 8),
      (8, 4L, 8L, 8L, 1.0)), out)
  }
  test("readability: run counts and the Flesch closed form; empty doc is NULL/'empty'") {
    // "See Spot run. Go!" → words 4 (See,Spot,run,Go), sentences 2
    // ('.', '!'), syllables: ee|o|u|o = 4 vowel runs
    val d = Seq((1L, "See Spot run. Go!"), (2L, "!!!")).toDF("doc_id", "text")
    val got = TextOps.readability(d)
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "flesch", "band")
      .as[(Long, Long, Long, Long, Option[Double], String)].collect()
      .map(r => r._1 -> r).toMap
    val f = 206.835 - 1.015 * (4.0 / 2) - 84.6 * (4.0 / 4)
    assert(got(1L) == ((1L, 4L, 2L, 4L, Some(f), "very_easy")), got(1L))
    // no words: NULL score, sentence floor keeps the count at 1
    assert(got(2L) == ((2L, 0L, 1L, 0L, None, "empty")), got(2L))
  }
}
