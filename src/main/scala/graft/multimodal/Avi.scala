package graft.multimodal

import java.io.ByteArrayOutputStream

/** Minimal MJPEG-in-AVI (RIFF) container: enough of the public AVI
  * spec (Microsoft "AVI RIFF File Reference") to round-trip motion-
  * JPEG video with ZERO dependencies — each frame is an ordinary JPEG
  * (the one video "codec" the JDK ships, via ImageIO), and the
  * container is plain RIFF chunk plumbing. This is what turns the
  * repo's video path from a byte-slicing stub into a real
  * encode → parse → per-frame-decode pipeline: the reference treats
  * media as opaque payloads, so matching it "for real" only needs a
  * genuine container + codec boundary, not an ffmpeg binding.
  *
  * Layout written (and tolerated back):
  * {{{
  * RIFF('AVI '
  *   LIST('hdrl'
  *     avih(56)                       // µs/frame, totalFrames, w, h
  *     LIST('strl' strh(56) strf(40)) // 'vids'/'MJPG' + BITMAPINFOHEADER
  *   )
  *   LIST('movi' ('00dc' jpeg)*)      // word-aligned frame chunks
  *   idx1(16·n)                       // keyframe index
  * )
  * }}}
  * The parser walks chunks structurally (no offset assumptions, idx1
  * optional, '##dc'/'##db' both accepted as frames) so third-party
  * MJPEG AVIs with extra LISTs (INFO, JUNK padding) still parse.
  */
object Avi {

  final case class Parsed(width: Int, height: Int, totalFrames: Int,
                          frames: Vector[Array[Byte]])

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private final class LE(out: ByteArrayOutputStream) {
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
  }

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(); val w = new LE(out)
    w.bytes(fourcc(id)); w.u32(body.length); w.bytes(body)
    if (body.length % 2 == 1) out.write(0) // RIFF chunks are word-aligned
    out.toByteArray
  }

  private def list(kind: String, body: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(); val w = new LE(out)
    w.bytes(fourcc("LIST")); w.u32(body.length + 4); w.bytes(fourcc(kind)); w.bytes(body)
    out.toByteArray
  }

  /** Encode JPEG frames into an MJPEG AVI. All frames must share the
    * (width, height) the header declares. */
  def encode(jpegFrames: Seq[Array[Byte]], width: Int, height: Int, fps: Int = 10): Array[Byte] = {
    require(jpegFrames.nonEmpty, "AVI needs at least one frame")
    val maxFrame = jpegFrames.map(_.length).max

    val avih = { // AVIMAINHEADER (56 bytes after the fourcc+size)
      val out = new ByteArrayOutputStream(); val w = new LE(out)
      w.u32(1000000 / fps); w.u32(0); w.u32(0)
      w.u32(0x10) // AVIF_HASINDEX
      w.u32(jpegFrames.length); w.u32(0); w.u32(1); w.u32(maxFrame)
      w.u32(width); w.u32(height)
      (0 until 4).foreach(_ => w.u32(0))
      chunk("avih", out.toByteArray)
    }

    val strh = { // AVISTREAMHEADER for the single 'vids' stream
      val out = new ByteArrayOutputStream(); val w = new LE(out)
      w.bytes(fourcc("vids")); w.bytes(fourcc("MJPG"))
      w.u32(0); w.u16(0); w.u16(0); w.u32(0)
      w.u32(1); w.u32(fps) // dwScale / dwRate = frame period
      w.u32(0); w.u32(jpegFrames.length); w.u32(maxFrame)
      w.u32(-1) // dwQuality: default
      w.u32(0)
      w.u16(0); w.u16(0); w.u16(width); w.u16(height) // rcFrame
      chunk("strh", out.toByteArray)
    }

    val strf = { // BITMAPINFOHEADER
      val out = new ByteArrayOutputStream(); val w = new LE(out)
      w.u32(40); w.u32(width); w.u32(height); w.u16(1); w.u16(24)
      w.bytes(fourcc("MJPG")); w.u32(width * height * 3)
      w.u32(0); w.u32(0); w.u32(0); w.u32(0)
      chunk("strf", out.toByteArray)
    }

    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))

    val moviBody = new ByteArrayOutputStream()
    val offsets = jpegFrames.map { f =>
      val off = moviBody.size() + 4 // offset of the '00dc' fourcc from 'movi'
      moviBody.write(chunk("00dc", f))
      off
    }
    val movi = list("movi", moviBody.toByteArray)

    val idx1 = {
      val out = new ByteArrayOutputStream(); val w = new LE(out)
      jpegFrames.zip(offsets).foreach { case (f, off) =>
        w.bytes(fourcc("00dc")); w.u32(0x10) // AVIIF_KEYFRAME
        w.u32(off); w.u32(f.length)
      }
      chunk("idx1", out.toByteArray)
    }

    val riffBody = fourcc("AVI ") ++ hdrl ++ movi ++ idx1
    val out = new ByteArrayOutputStream(); val w = new LE(out)
    w.bytes(fourcc("RIFF")); w.u32(riffBody.length); w.bytes(riffBody)
    out.toByteArray
  }

  /** RIFF sizes are unsigned 32-bit; read into a Long so a hostile/corrupt
    * size >= 2 GiB can't wrap negative (a signed wrap made the walk's
    * `i = body + size + pad` stall or mis-slice instead of clamping). */
  private def readU32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def id(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Parse an MJPEG AVI: header geometry + every frame's JPEG bytes.
    * Structural walk — any chunk order, unknown chunks skipped, idx1
    * not required. Throws IllegalArgumentException on a non-AVI
    * payload (the caller decides whether that is a data error). */
  def parse(bytes: Array[Byte]): Parsed = {
    require(bytes.length >= 12 && id(bytes, 0) == "RIFF" && id(bytes, 8) == "AVI ",
      "not a RIFF/AVI payload")
    var width = 0; var height = 0; var total = 0
    val frames = Vector.newBuilder[Array[Byte]]

    def walk(from: Int, until: Int): Unit = {
      var i = from
      while (i + 8 <= until) {
        val ck = id(bytes, i)
        val size = readU32(bytes, i + 4) // unsigned — can exceed the buffer
        val body = i + 8
        // Clamp every slice to the enclosing extent: an oversized (or
        // crafted) chunk size degrades to "rest of the parent", never an
        // out-of-bounds or negative range.
        val end = math.min(body.toLong + size, until.toLong).toInt
        ck match {
          case "LIST" if size >= 4 =>
            walk(body + 4, end) // skip the list-kind fourcc, recurse
          case "avih" if size >= 40 =>
            total = readU32(bytes, body + 16).toInt
            width = readU32(bytes, body + 32).toInt
            height = readU32(bytes, body + 36).toInt
          case c if c.length == 4 && (c.endsWith("dc") || c.endsWith("db")) &&
            c.take(2).forall(_.isDigit) =>
            frames += java.util.Arrays.copyOfRange(bytes, body, end)
          case _ => () // strh/strf/idx1/JUNK/INFO: not needed for decode
        }
        // size >= 0 as a Long, so next > i always holds — the walk cannot
        // stall on any input; clamp to `until` so Int arithmetic can't wrap.
        val next = body.toLong + size + (size & 1L)
        i = if (next > until) until else next.toInt
      }
    }
    walk(12, bytes.length)
    val fs = frames.result()
    Parsed(width, height, if (total > 0) total else fs.length, fs)
  }
}
