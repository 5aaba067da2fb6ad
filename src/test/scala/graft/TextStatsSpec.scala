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

  test("token counts: regex vs whitespace vs bpe-ish vs distinct") {
    val t = TextOps.tokenCounts(docs).filter($"doc_id" === 1)
      .select("n_tokens", "n_ws_tokens", "n_bpe_tokens", "n_distinct_tokens")
      .as[(Long, Long, Long, Long)].head()
    // bpe-ish: 6 words + "," + "!" = 8
    assert(t == ((6L, 6L, 8L, 6L)))
  }

  test("fake feature extraction: normalized vectors flow into VectorOps") {
    val m = Multimodal.attachMedia(docs)
    val feats = Multimodal.fakeFeatures(m, dim = 8)
    val top = graft.vector.VectorOps.cosineTopK(feats, feats.filter($"vec_id" === 1), k = 2)
    assert(top.count() == 2)
    val norms = feats.select(graft.vector.VectorOps.norm($"v")).as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-12))
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

  test("resize and frame-sample keep the binary pipeline shape") {
    val m = Multimodal.attachMedia(docs)
    val resized = Multimodal.fakeResize(m, maxBytes = 10)
    assert(resized.count() == docs.count())
    resized.select("n_bytes").as[Long].collect().foreach(n => assert(n <= 10))
    val frames = Multimodal.frameSample(m, nFrames = 4)
    assert(frames.count() == docs.count() * 4)
    // frames reassemble a prefix of the original payload (no byte loss
    // inside the sampled windows; deterministic slicing)
    val re = frames.orderBy("doc_id", "frame_idx")
      .groupBy("doc_id").agg(collect_list($"frame").as("fs"))
    val joined = re.join(m, "doc_id")
      .select($"fs", length($"media").cast("long").as("len"))
      .as[(Seq[Array[Byte]], Long)].collect()
    joined.foreach { case (fs, len) =>
      val total = fs.map(_.length).sum
      assert(total >= len - 4 && total <= len) // ≤ nFrames-1 tail bytes dropped by integer windows
    }
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

  test("multimodal plumbing: binary payload roundtrip metadata") {
    val m = Multimodal.fakeDecode(Multimodal.attachMedia(docs))
    val r = m.filter($"doc_id" === 2).select("kind", "n_bytes", "checksum")
      .as[(String, Long, String)].head()
    assert(r._1 == "image" && r._2 == 4L)
    val expectedMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest("aaaa".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r._3 == expectedMd5)
  }
}
