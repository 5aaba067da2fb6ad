package graft

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.multimodal.{Avi, Multimodal}

/** The MJPEG-AVI container and the video pipeline built on it.
  * Container-level drills run plain JVM (no Spark); pipeline drills
  * run the real DataFrame operators. */
class AviSpec extends SparkSpec {

  private def jpeg(w: Int, h: Int, seed: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 31 + y * 7 + seed * 97) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  test("AVI encode → parse roundtrip: geometry, frame count, decodable JPEG frames") {
    val frames = (0 until 5).map(jpeg(24, 18, _))
    val avi = Avi.encode(frames, 24, 18)
    val parsed = Avi.parse(avi)
    assert(parsed.width == 24 && parsed.height == 18 && parsed.totalFrames == 5)
    assert(parsed.frames.length == 5)
    // byte-identical frame payloads in order, and each decodes
    parsed.frames.zip(frames).foreach { case (got, want) =>
      assert(java.util.Arrays.equals(got, want))
    }
    val img = ImageIO.read(new ByteArrayInputStream(parsed.frames(3)))
    assert(img.getWidth == 24 && img.getHeight == 18)
  }

  test("parser is structural: odd-sized frames word-align, junk chunks skipped, no idx1 needed") {
    // force an odd-length frame chunk (JPEG sizes vary; pad one byte
    // if even) to exercise the alignment path
    val f0 = jpeg(9, 7, 1)
    val odd = if (f0.length % 2 == 1) f0 else f0 :+ 0xd9.toByte
    val avi = Avi.encode(Seq(odd, jpeg(9, 7, 2)), 9, 7)
    // splice a JUNK chunk between hdrl and movi — players emit these
    val junk = "JUNK".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val moviAt = {
      var i = 12; var found = -1
      while (found < 0 && i + 12 <= avi.length) {
        if (new String(avi, i, 4, "US-ASCII") == "LIST" &&
          new String(avi, i + 8, 4, "US-ASCII") == "movi") found = i
        else {
          val sz = (avi(i + 4) & 0xff) | ((avi(i + 5) & 0xff) << 8) |
            ((avi(i + 6) & 0xff) << 16) | ((avi(i + 7) & 0xff) << 24)
          i += 8 + sz + (sz % 2)
        }
      }
      found
    }
    assert(moviAt > 0)
    val spliced = avi.take(moviAt) ++ junk ++ avi.drop(moviAt)
    // fix the RIFF size field for the inserted bytes
    val total = spliced.length - 8
    spliced(4) = (total & 0xff).toByte; spliced(5) = ((total >> 8) & 0xff).toByte
    spliced(6) = ((total >> 16) & 0xff).toByte; spliced(7) = ((total >> 24) & 0xff).toByte
    val parsed = Avi.parse(spliced)
    assert(parsed.totalFrames == 2 && parsed.frames.length == 2)
    assert(java.util.Arrays.equals(parsed.frames.head, odd))
  }

  test("non-AVI payload is rejected, not misparsed") {
    intercept[IllegalArgumentException](Avi.parse("not a riff file at all".getBytes))
    intercept[IllegalArgumentException](Avi.parse(Array[Byte](1, 2, 3)))
  }

  test("hostile chunk sizes terminate: negative-wrap (0xFFFFFFF8) and >2GiB sizes clamp, never hang") {
    // a size field of 0xFFFFFFF8 (-8 signed) used to make the walk's
    // next-offset equal the current one — infinite loop in a task
    val base = Avi.encode(Seq(jpeg(8, 8, 1)), 8, 8)
    val evil = base.clone()
    // find the first '00dc' frame chunk and poison its size field
    var at = -1; var i = 12
    while (at < 0 && i + 8 <= evil.length) {
      if (new String(evil, i, 4, "US-ASCII") == "00dc") at = i
      else i += 1
    }
    assert(at > 0)
    evil(at + 4) = 0xf8.toByte; evil(at + 5) = 0xff.toByte
    evil(at + 6) = 0xff.toByte; evil(at + 7) = 0xff.toByte
    val p = Avi.parse(evil) // must terminate; frame clamps to rest-of-parent
    assert(p.frames.length == 1)
    // a merely-huge (not sign-wrapping) size also clamps instead of slicing OOB
    evil(at + 4) = 0; evil(at + 5) = 0; evil(at + 6) = 0; evil(at + 7) = 0x7f.toByte
    assert(Avi.parse(evil).frames.length == 1)
  }

  test("resizeMedia names the doc on a frameless AVI instead of a bare require") {
    import spark.implicits._
    // structurally valid RIFF/AVI with an avih header but zero frame chunks
    val headerOnly = {
      val out = new ByteArrayOutputStream()
      val avih = new Array[Byte](56)
      def u32(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val chunk = "avih".getBytes("US-ASCII") ++ u32(56) ++ avih
      val body = "AVI ".getBytes("US-ASCII") ++ chunk
      out.write("RIFF".getBytes("US-ASCII")); out.write(u32(body.length)); out.write(body)
      out.toByteArray
    }
    assert(Avi.parse(headerOnly).frames.isEmpty)
    val df = Seq((42L, headerOnly, "video")).toDF("doc_id", "media", "kind")
    val e = intercept[Exception](Multimodal.resizeMedia(df, 8).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("doc_id=42") && m.contains("no frame chunks")))
  }

  test("video pipeline: attach → meta → frames → resize agree with the formulas") {
    import spark.implicits._
    val docs = Seq(
      (0L, "short"),
      (1L, "a considerably longer document body with many words in it"),
      (2L, ""), // empty text: len 0 → 16×12, 3 frames
      (3L, "x" * 100)).toDF("doc_id", "text")

    val vids = Multimodal.attachVideo(docs).cache()
    val meta = Multimodal.decodeMeta(vids)
      .select("doc_id", "width", "height", "n_samples").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    for ((id, w, h, n) <- meta) {
      val len = docs.filter($"doc_id" === id).head().getString(1).length
      assert(w == 16 + len % 24 && h == 12 + len % 12 && n == 3 + len % 5,
        s"doc $id len $len got ${(w, h, n)}")
    }

    // frame sampling: 3 per clip, PNG-decodable at clip geometry
    val fm = Multimodal.frameMeta(Multimodal.frameSample(vids, 3))
    assert(fm.count() == 12) // 4 docs × 3 frames
    val byDoc = fm.groupBy("doc_id").agg(
      countDistinct("frame_idx").as("nf"), max("width").as("w"), min("width").as("w2"))
      .as[(Long, Long, Long, Long)].collect()
    byDoc.foreach { case (id, nf, w, w2) =>
      assert(nf == 3 && w == w2, s"doc $id frames inconsistent")
    }

    // resize: long side 8, frame count preserved
    val rs = Multimodal.decodeMeta(Multimodal.resizeMedia(vids, 8))
      .select("doc_id", "width", "height", "n_samples").as[(Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    rs.zip(meta).foreach { case ((id, w2, h2, n2), (_, w, h, n)) =>
      val long = math.max(w, h)
      assert(w2 == math.max(1, w * 8 / long) && h2 == math.max(1, h * 8 / long),
        s"doc $id resized to ${(w2, h2)} from ${(w, h)}")
      assert(n2 == n, s"doc $id lost frames in resize: $n2 != $n")
    }
    vids.unpersist()
  }

  test("features accepts video: per-clip luminance embedding, L2-normalized") {
    import spark.implicits._
    val docs = Seq((0L, "video feature doc"), (1L, "another one")).toDF("doc_id", "text")
    val f = Multimodal.features(Multimodal.attachVideo(docs), dim = 8)
      .as[(Long, Seq[Double])].collect()
    assert(f.length == 2)
    f.foreach { case (_, v) =>
      assert(v.length == 8)
      val n2 = v.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-9)
    }
  }

  test("media memo: one handle per (session, key, kind), persisted, survives clearCache") {
    import spark.implicits._
    val docs = Seq((0L, "memo doc one"), (1L, "memo doc two")).toDF("doc_id", "text")
    val a = Multimodal.attachVideoMemo(docs, "memo-spec")
    val b = Multimodal.attachVideoMemo(docs, "memo-spec")
    // SAME DataFrame instance — this is the whole point: RDD-backed
    // frames get fresh lineage per call, so CacheManager subtree
    // sharing can never dedup them; only an explicit shared handle can
    assert(a eq b, "attachVideoMemo must return the identical handle")
    assert(a.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "memoized frame must be marked persistent")
    // results flow and match the unmemoized synthesis
    val direct = Multimodal.decodeMeta(Multimodal.attachVideo(docs))
      .orderBy("doc_id").collect().toSeq
    val viaMemo = Multimodal.decodeMeta(a).orderBy("doc_id").collect().toSeq
    assert(viaMemo == direct)
    // Bench clears caches at family boundaries: the handle must stay
    // valid and re-mark itself for caching on next access
    spark.catalog.clearCache()
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    val c = Multimodal.attachVideoMemo(docs, "memo-spec")
    assert(c eq a)
    assert(c.storageLevel != org.apache.spark.storage.StorageLevel.NONE,
      "post-clearCache access must re-persist the shared handle")
    assert(Multimodal.decodeMeta(c).orderBy("doc_id").collect().toSeq == direct)
    // distinct keys and kinds get distinct handles
    assert(!(Multimodal.attachVideoMemo(docs, "memo-spec-2") eq a))
    assert(!(Multimodal.attachMediaMemo(docs, "memo-spec") eq a))
  }
}
