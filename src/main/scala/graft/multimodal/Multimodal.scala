package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** Multimodal columns: media as opaque `binary` columns with typed
  * metadata, decoded/transformed per-partition in batches.
  *
  * The image and audio paths are REAL — the JDK ships the codecs:
  * `javax.imageio` (PNG/JPEG/BMP/GIF) and `javax.sound.sampled`
  * (WAV/PCM). [[attachMedia]] synthesizes genuine PNG images and WAV
  * clips deterministically from each doc's text, [[decodeMeta]]
  * parses the actual containers back (the oracle independently
  * predicts the dims from the text length — a true encode→decode
  * roundtrip check), [[resizeMedia]] really rescales pixels /
  * truncates PCM, and [[features]] histograms decoded luminance /
  * amplitude into a normalized embedding for
  * [[graft.vector.VectorOps]].
  *
  * VIDEO is real too since round 7: [[attachVideo]] synthesizes
  * MJPEG-in-AVI payloads ([[Avi]] — RIFF container hand-rolled, JPEG
  * frames via ImageIO, still zero dependencies), [[decodeMeta]]
  * parses the container header back, [[frameSample]] extracts and
  * DECODES the sampled frames (re-emitted as lossless PNG),
  * [[resizeMedia]] rescales every frame and re-containers, and
  * [[frameMeta]] decodes emitted frames — the oracle predicts
  * geometry and frame counts from strlen(text) independently. (For
  * `image` kind [[frameSample]] emits real tiled crops — decoded
  * horizontal pixel strips; video is the real timeline fan-out path.)
  *
  * Everything runs as per-partition closures over binary columns —
  * one decoder instance per partition, rows as a streaming iterator;
  * the same placement a JNI/ffmpeg handle would use at 100 TB.
  */
object Multimodal {

  val SampleRate = 8000

  /** Session-scoped memo for the synthesized media frames.
    *
    * [[attachMedia]]/[[attachVideo]] return RDD-backed DataFrames, so
    * every call creates FRESH lineage — Spark's CacheManager dedups
    * canonically-identical *plans* (the lshNearDupPairs idiom), but two
    * RDD scans are never canonically equal, so the eight image/audio/
    * video gates each paid a full PNG/WAV/MJPEG synthesis. Memoizing
    * the persisted frame per (session, key, kind) hands ALL gates the
    * SAME handle: one synthesis per corpus, shared across queries.
    *
    * Interaction with Bench's family-boundary `clearCache()`: clearing
    * drops the cached data but the memoized handle stays valid — the
    * `storageLevel == NONE` check re-marks it for caching on next use,
    * so a later family re-entry repopulates ONE entry instead of
    * growing new lineage. Keyed by session so a fresh SparkSession
    * (each spec suite) never sees another session's frames.
    */
  private val mediaMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def memo(s: SparkSession, key: String, kind: String)(build: => DataFrame): DataFrame = {
    val df = mediaMemo.getOrElseUpdate((s, key, kind), build)
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df
  }

  /** Memoized [[attachMedia]]: one synthesis per (session, key), shared
    * by every image/audio gate. `key` names the corpus (the sf dir). */
  def attachMediaMemo(docs: DataFrame, key: String): DataFrame =
    memo(docs.sparkSession, key, "media")(attachMedia(docs))

  /** Memoized [[attachVideo]]: one MJPEG/AVI synthesis per (session,
    * key), shared by video_meta / video_frames / video_resize. */
  def attachVideoMemo(docs: DataFrame, key: String): DataFrame =
    memo(docs.sparkSession, key, "video")(attachVideo(docs))

  /** Deterministic media-geometry formulas, shared with the oracle
    * (which predicts them from strlen(text)). */
  private def imgW(len: Int) = 16 + len % 32
  private def imgH(len: Int) = 8 + len % 16
  private def nSamples(len: Int) = 256 + (len * 7) % 1024
  private def vidW(len: Int) = 16 + len % 24
  private def vidH(len: Int) = 12 + len % 12
  private def vidFrames(len: Int) = 3 + len % 5

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sample_rate", LongType),
    StructField("n_samples", LongType)))

  /** ImageIO's default ImageInputStream/ImageOutputStream scratch is
    * DISK-backed: every decode/encode — and the media corpus is tens of
    * thousands of tiny frames per query — creates, writes and deletes a
    * temp FILE. One JVM-wide switch moves the scratch buffer to memory;
    * decoded pixels and encoded bytes are bit-identical. Lazy val so
    * the setter runs once per executor JVM, on first media touch. */
  private lazy val imageIoInMemory: Unit = ImageIO.setUseCache(false)

  /** All frame decodes funnel here so the in-memory scratch switch is
    * guaranteed set in whichever JVM runs the task. */
  private[multimodal] def readImage(bytes: Array[Byte]): BufferedImage = {
    imageIoInMemory
    ImageIO.read(new ByteArrayInputStream(bytes))
  }

  private def pngBytes(img: BufferedImage): Array[Byte] = {
    imageIoInMemory
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def jpegBytes(img: BufferedImage): Array[Byte] = {
    imageIoInMemory
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", out)
    out.toByteArray
  }

  /** One deterministic video frame: pixels from the text bytes, phase-
    * shifted per frame so consecutive frames genuinely differ. */
  private def videoFrame(bytes: Array[Byte], w: Int, h: Int, f: Int): BufferedImage = {
    def b(i: Int): Int = if (bytes.isEmpty) 120 else bytes(i % bytes.length) & 0xff
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = b(x + y + f * 7)
        img.setRGB(x, y,
          ((c * 31 + f * 53) % 256 << 16) | ((x * 5 + c) % 256 << 8) | ((y * 13 + c + f) % 256))
        x += 1
      }
      y += 1
    }
    img
  }

  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) { // 16-bit little-endian PCM
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1, true, false)
    val stream = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Synthesize a REAL media payload per doc, deterministically from
    * its text: even doc_id → PNG (pixels derived from the text
    * bytes), odd → WAV (PCM samples derived likewise). Output:
    * (doc_id, media BINARY, kind). */
  def attachMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("kind", StringType)))
    val rdd = docs.select("doc_id", "text").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        // GEOMETRY uses the raw byte length — the oracle predicts dims
        // from strlen(text), so clamping here would diverge on an
        // empty doc; only the content SAMPLER needs the empty guard
        val len = bytes.length
        def b(i: Int): Int = if (bytes.isEmpty) 120 else bytes(i % bytes.length) & 0xff
        if (id % 2 == 0) {
          val (w, h) = (imgW(len), imgH(len))
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val c = b(x + y)
              img.setRGB(x, y,
                ((c * 37) % 256 << 16) | ((x * 7 + c) % 256 << 8) | ((y * 11 + c) % 256))
              x += 1
            }
            y += 1
          }
          Row(id, pngBytes(img), "image")
        } else {
          val n = nSamples(len)
          val samples = Array.tabulate(n)(i => ((b(i) - 96) * 250).toShort)
          Row(id, wavBytes(samples), "audio")
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Synthesize a REAL VIDEO payload per doc: `vidFrames(len)` JPEG
    * frames in an MJPEG AVI container ([[Avi.encode]]), geometry and
    * frame count deterministic from strlen(text) so the oracle can
    * predict them without touching the container. Output matches
    * [[attachMedia]]: (doc_id, media BINARY, kind='video'). */
  def attachVideo(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media", BinaryType),
      StructField("kind", StringType)))
    val rdd = docs.select("doc_id", "text").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getString(1).getBytes("UTF-8")
        val len = bytes.length
        val (w, h, n) = (vidW(len), vidH(len), vidFrames(len))
        val jpegs = (0 until n).map(f => jpegBytes(videoFrame(bytes, w, h, f)))
        Row(id, Avi.encode(jpegs, w, h), "video")
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL decode of the binary column: PNG headers → pixel dims via
    * ImageIO, WAV headers → sample rate and frame count via
    * AudioSystem, AVI headers → dims + total frames via [[Avi.parse]]
    * (video reports frame count in `n_samples`, sample_rate 0).
    * One decoder per partition, streaming rows. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media", "kind").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        r.getString(2) match {
          case "image" =>
            val img = readImage(bytes)
            Row(id, "image", img.getWidth.toLong, img.getHeight.toLong, 0L, 0L)
          case "video" =>
            val avi = Avi.parse(bytes)
            Row(id, "video", avi.width.toLong, avi.height.toLong, 0L, avi.totalFrames.toLong)
          case kind =>
            val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
            val out = Row(id, kind, 0L, 0L,
              in.getFormat.getSampleRate.toLong, in.getFrameLength)
            in.close(); out
        }
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** REAL resize: images are rescaled to fit `maxDim` pixels on the
    * long side (aspect preserved, min 1px) and re-encoded as PNG;
    * audio is truncated to at most `maxDim`×100 PCM samples and
    * re-containered as WAV. Output (doc_id, kind, media, n_bytes). */
  def resizeMedia(media: DataFrame, maxDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("kind", StringType),
      StructField("media", BinaryType),
      StructField("n_bytes", LongType)))
    val rdd = media.select("doc_id", "media", "kind").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val kind = r.getString(2)
        val out: Array[Byte] = kind match {
          case "video" =>
            // rescale EVERY frame with the same integer arithmetic as
            // the image branch, re-encode JPEG, re-container as AVI
            val avi = Avi.parse(bytes)
            // A structurally-valid AVI can still carry zero frame chunks
            // (header-only, or frames under an unrecognized stream id);
            // name the row rather than let Avi.encode's require surface
            // as a bare IllegalArgumentException from inside a task.
            if (avi.frames.isEmpty) throw new IllegalArgumentException(
              s"resizeMedia: doc_id=$id parsed as AVI but has no frame chunks")
            val longSide = math.max(avi.width, avi.height)
            val (w, h) = (math.max(1, avi.width * maxDim / longSide),
              math.max(1, avi.height * maxDim / longSide))
            val resized = avi.frames.map { jpeg =>
              val img = readImage(jpeg)
              val small = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
              val g = small.createGraphics()
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              jpegBytes(small)
            }
            Avi.encode(resized, w, h)
          case "image" =>
            val img = readImage(bytes)
            // INTEGER scaling (dim·maxDim div longSide), not float: the
            // resize roundtrip is oracle-checked, and (w * (8.0/w))
            // .toInt is one ulp away from flooring to maxDim-1
            val longSide = math.max(img.getWidth, img.getHeight)
            val (w, h) = (math.max(1, img.getWidth * maxDim / longSide),
              math.max(1, img.getHeight * maxDim / longSide))
            val small = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val g = small.createGraphics()
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            pngBytes(small)
          case _ =>
            val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
            val keep = math.min(in.getFrameLength, maxDim.toLong * 100).toInt
            val pcm = new Array[Byte](keep * 2)
            var read = 0
            while (read < pcm.length) {
              val k = in.read(pcm, read, pcm.length - read)
              if (k <= 0) read = pcm.length else read += k
            }
            in.close()
            val samples = Array.tabulate(keep)(i =>
              ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort)
            wavBytes(samples)
        }
        Row(id, kind, out, out.length.toLong)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Frame sampling — the explode shape of video processing: ONE
    * binary row fans out to `nFrames` rows (doc_id, frame_idx,
    * frame). `video`: evenly-sampled container frames, JPEG-decoded
    * and re-emitted as PNG. `audio`: REAL windowed WAV clips (decoded
    * PCM re-containered per window). `image`: real tiled crops —
    * decoded horizontal pixel strips re-encoded as PNG (a still has
    * no timeline, so spatial tiles are the honest analogue). Fan-out
    * stays inside the iterator: a partition streams frames at bounded
    * memory. */
  def frameSample(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("frame", BinaryType)))
    val rdd = media.select("doc_id", "media", "kind").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (r.getString(2) == "video") {
          // THE real frame-sampling path: parse the container, pick
          // nFrames evenly across the timeline (floor(f·total/k) —
          // deterministic, first frame always included), DECODE each
          // JPEG and re-emit as lossless PNG so downstream consumers
          // get pixels, not codec artifacts compounding per hop
          val avi = Avi.parse(bytes)
          val total = avi.frames.length
          val k = math.min(nFrames, total)
          (0 until k).iterator.map { f =>
            val img = readImage(avi.frames(f * total / k))
            Row(id, f.toLong, pngBytes(img))
          }
        } else if (r.getString(2) == "audio") {
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          val total = in.getFrameLength.toInt
          val pcm = new Array[Byte](total * 2)
          var read = 0
          while (read < pcm.length) {
            val k = in.read(pcm, read, pcm.length - read)
            if (k <= 0) read = pcm.length else read += k
          }
          in.close()
          val win = math.max(1, total / nFrames)
          (0 until nFrames).iterator.map { f =>
            val from = math.min(f * win, total)
            val until = if (f == nFrames - 1) total else math.min(from + win, total)
            val samples = Array.tabulate(until - from)(i =>
              ((pcm(2 * (from + i)) & 0xff) | (pcm(2 * (from + i) + 1) << 8)).toShort)
            Row(id, f.toLong, wavBytes(samples))
          }
        } else {
          // image: a still has no timeline, so "frames" are REAL tiled
          // crops — nFrames horizontal strips of decoded pixels, each
          // re-emitted as PNG (≥1px tall; short images repeat rows at
          // the tail so the fan-out contract of nFrames rows holds)
          val img = readImage(bytes)
          val (w, h) = (img.getWidth, img.getHeight)
          (0 until nFrames).iterator.map { f =>
            val y0 = math.min(f * h / nFrames, h - 1)
            val y1 = math.min(math.max(y0 + 1, (f + 1) * h / nFrames), h)
            Row(id, f.toLong, pngBytes(img.getSubimage(0, y0, w, y1 - y0)))
          }
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** REAL feature extraction: decoded pixel luminance (images) or PCM
    * amplitude (audio) histogrammed into `dim` buckets, L2-normalized.
    * Output (vec_id, v: array<double>) plugs into
    * [[graft.vector.VectorOps]] — media → embedding → ANN. */
  def features(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val rdd = media.select("doc_id", "media", "kind").rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](dim)
        def histImage(img: BufferedImage): Unit = {
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              hist(lum * dim / 256) += 1.0
              x += 1
            }
            y += 1
          }
        }
        if (r.getString(2) == "image") {
          histImage(readImage(bytes))
        } else if (r.getString(2) == "video") {
          // luminance over every decoded frame — one embedding per clip
          Avi.parse(bytes).frames.foreach(jpeg =>
            histImage(readImage(jpeg)))
        } else {
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          val total = in.getFrameLength.toInt
          val pcm = new Array[Byte](total * 2)
          var read = 0
          while (read < pcm.length) {
            val k = in.read(pcm, read, pcm.length - read)
            if (k <= 0) read = pcm.length else read += k
          }
          in.close()
          var i = 0
          while (i < total) {
            val s = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort
            hist(((s.toInt + 32768) * dim) >>> 16) += 1.0
            i += 1
          }
        }
        var n2 = 0.0
        hist.foreach(x => n2 += x * x)
        val norm = math.sqrt(n2)
        val v = if (norm > 0) hist.map(_ / norm) else hist
        Row(r.getLong(0), v.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Perceptual DIFFERENCE HASH (dHash) per image — the standard
    * near-duplicate image fingerprint (a 64-bit gradient sketch:
    * sample a (gw+1-wide conceptual) gw×gh grayscale grid by
    * nearest-neighbor, set bit k=j·(gw−1)+i iff gray(i+1,j) >
    * gray(i,j)). The decode is the REAL JDK PNG path; sampling is
    * integer arithmetic (x = i·w div gw, y = j·h div gh; gray =
    * (r+g+b) div 3) so the oracle can restate the whole hash from
    * the synthesis formula without decoding. The 64 bits split into
    * two non-negative LONGs (dhash_hi = bits 32..63, dhash_lo =
    * bits 0..31) so downstream XOR/bit_count stays sign-free in any
    * engine. One map pass, no shuffle. */
  def imageDHash(media: DataFrame, gw: Int = 9, gh: Int = 8): DataFrame = {
    require((gw - 1) * gh <= 64, s"dHash grid ${gw}x$gh exceeds 64 bits")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("dhash_hi", LongType),
      StructField("dhash_lo", LongType)))
    val rdd = media.filter(col("kind") === "image")
      .select("doc_id", "media").rdd.mapPartitions { rows =>
        rows.map { r =>
          val img = readImage(r.getAs[Array[Byte]](1))
          val (w, h) = (img.getWidth, img.getHeight)
          val gray = Array.ofDim[Int](gh, gw)
          var j = 0
          while (j < gh) {
            var i = 0
            while (i < gw) {
              val rgb = img.getRGB(i * w / gw, j * h / gh)
              gray(j)(i) =
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              i += 1
            }
            j += 1
          }
          var lo = 0L
          var hi = 0L
          j = 0
          while (j < gh) {
            var i = 0
            while (i < gw - 1) {
              if (gray(j)(i + 1) > gray(j)(i)) {
                val k = j * (gw - 1) + i
                if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
              }
              i += 1
            }
            j += 1
          }
          Row(r.getLong(0), hi, lo)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-image LUMINANCE profile over the REAL PNG decode — the
    * image-quality screen a multimodal pipeline runs before training
    * (all-black/all-white/low-contrast images are the visual analog
    * of garbage text): width/height, pixel count, exact integer gray
    * sum (mean = one raw IEEE division), min/max gray and contrast.
    * Every pixel folds inside the decoder loop — bounded memory, one
    * map pass, no shuffle, no per-pixel row explosion; the oracle
    * restates the stats from the pixel-synthesis formula without
    * decoding, so value-equality proves the whole decode chain. */
  def imageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("n_pixels", LongType),
      StructField("sum_gray", LongType),
      StructField("min_gray", LongType),
      StructField("max_gray", LongType)))
    val rdd = media.filter(col("kind") === "image")
      .select("doc_id", "media").rdd.mapPartitions { rows =>
        rows.map { r =>
          val img = readImage(r.getAs[Array[Byte]](1))
          val (w, h) = (img.getWidth, img.getHeight)
          var sum = 0L; var mn = 256L; var mx = -1L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val g = ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3).toLong
              sum += g; if (g < mn) mn = g; if (g > mx) mx = g
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), w.toLong, h.toLong, w.toLong * h, sum, mn, mx)
        }
      }
    spark.createDataFrame(rdd, schema)
      .withColumn("mean_gray", col("sum_gray").cast("double") / col("n_pixels").cast("double"))
      .withColumn("contrast", col("max_gray") - col("min_gray"))
  }

  /** LUMINANCE-HISTOGRAM ENTROPY per image — the blank/flat-image
    * filter a multimodal training pipeline runs before paying encoder
    * FLOPs (a single-color or near-constant image carries ~0 bits of
    * histogram entropy; a natural image sits near the ln 8 ceiling of
    * the 8-bin grid): H = −Σ p_b·ln p_b over 8 equal-width gray bins,
    * `flat` below 1.0. The 8 bin counts fold INSIDE the decoder loop
    * (the imageStats discipline — no per-pixel row explosion); the
    * entropy itself computes in the DataFrame layer from exact LONG
    * counts (9dp-decimal terms before the order-free sum, 6dp final —
    * the driftPsi ln discipline). */
  def imageEntropy(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val dec9 = org.apache.spark.sql.types.DecimalType(28, 9)
    val schema = StructType(
      StructField("doc_id", LongType) +:
        StructField("n_pixels", LongType) +:
        (0 until 8).map(i => StructField(s"b$i", LongType)))
    val rdd = media.filter(col("kind") === "image")
      .select("doc_id", "media").rdd.mapPartitions { rows =>
        rows.map { r =>
          val img = readImage(r.getAs[Array[Byte]](1))
          val (w, h) = (img.getWidth, img.getHeight)
          val bins = new Array[Long](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              bins(g >> 5) += 1
              x += 1
            }
            y += 1
          }
          Row.fromSeq(r.getLong(0) +: (w.toLong * h) +: bins.toSeq)
        }
      }
    val terms = (0 until 8).map { i =>
      val p = col(s"b$i").cast("double") / col("n_pixels").cast("double")
      when(col(s"b$i") > 0, round(p * log(p), 9).cast(dec9))
        .otherwise(lit(0).cast(dec9))
    }
    spark.createDataFrame(rdd, schema)
      .withColumn("entropy", round(-terms.reduce(_ + _).cast("double"), 6))
      .select(col("doc_id"), col("n_pixels"), col("entropy"),
        (col("entropy") < 1.0).as("flat"))
  }

  /** BLUR / SHARPNESS metric per image — the variance-of-Laplacian
    * focus measure (Pech-Pacheco et al., ICPR 2000), the image-QC
    * gate every multimodal pipeline runs before spending encoder
    * FLOPs on defocused frames (a defocused image's second
    * derivative collapses toward 0 everywhere): per interior pixel
    * the 4-neighbor Laplacian 4g − g_left − g_right − g_up − g_down
    * over the REAL decoded grayscale grid, reported as its variance.
    * Sums fold INSIDE the decoder loop as exact LONGs (the
    * imageStats discipline — no per-pixel row explosion); the
    * variance is one fixed-shape double expression over them.
    * `blurry` flags below `threshold` — never fires on the synthetic
    * pseudo-noise corpus (honest: noise is maximally sharp); the
    * DETECTION is spec-pinned on a constructed constant-color PNG
    * (lap_var exactly 0). */
  def imageBlur(media: DataFrame, threshold: Double = 100.0): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_interior", LongType),
      StructField("s1", LongType), StructField("s2", LongType)))
    val rdd = media.filter(col("kind") === "image")
      .select("doc_id", "media").rdd.mapPartitions { rows =>
        rows.map { r =>
          val img = readImage(r.getAs[Array[Byte]](1))
          val (w, h) = (img.getWidth, img.getHeight)
          val g = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              g(y)(x) =
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          var n = 0L; var s1 = 0L; var s2 = 0L
          y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val lap = 4 * g(y)(x) - g(y)(x - 1) - g(y)(x + 1) -
                g(y - 1)(x) - g(y + 1)(x)
              n += 1; s1 += lap; s2 += lap.toLong * lap
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), n, s1, s2)
        }
      }
    spark.createDataFrame(rdd, schema)
      .withColumn("lap_var",
        col("s2").cast("double") / col("n_interior")
          - (col("s1").cast("double") / col("n_interior"))
            * (col("s1").cast("double") / col("n_interior")))
      .withColumn("blurry", col("lap_var") < threshold)
      .select(col("doc_id"), col("n_interior"), col("lap_var"), col("blurry"))
  }

  /** COLORFULNESS metric per image (Hasler & Süsstrunk, SPIE 2003 —
    * the no-reference colorfulness measure stock-photo and web-corpus
    * pipelines rank with): over the opponent channels rg = R−G and
    * yb = (R+G)/2 − B, M = √(σ²_rg + σ²_yb) + 0.3·√(μ²_rg + μ²_yb).
    * A grayscale/sepia scan scores near 0; the synthetic corpus's
    * three independent channel formulas score high — both informative.
    * The yb channel is carried DOUBLED (yb2 = R+G−2B) so every
    * accumulated moment is an exact integer LONG inside the decode
    * loop (the imageStats discipline); the /2 enters once in the
    * final fixed-shape expression (§4). */
  def imageColorfulness(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_pixels", LongType),
      StructField("s_rg", LongType), StructField("s_rg2", LongType),
      StructField("s_yb2", LongType), StructField("s_yb2sq", LongType)))
    val rdd = media.filter(col("kind") === "image")
      .select("doc_id", "media").rdd.mapPartitions { rows =>
        rows.map { r =>
          val img = readImage(r.getAs[Array[Byte]](1))
          val (w, h) = (img.getWidth, img.getHeight)
          var n = 0L; var srg = 0L; var srg2 = 0L; var syb2 = 0L; var syb2sq = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val red = (rgb >> 16) & 0xff
              val grn = (rgb >> 8) & 0xff
              val blu = rgb & 0xff
              val rg = red - grn
              val yb2 = red + grn - 2 * blu
              n += 1
              srg += rg; srg2 += rg.toLong * rg
              syb2 += yb2; syb2sq += yb2.toLong * yb2
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), n, srg, srg2, syb2, syb2sq)
        }
      }
    spark.createDataFrame(rdd, schema)
      .withColumn("m_rg", col("s_rg").cast("double") / col("n_pixels"))
      .withColumn("m_yb2", col("s_yb2").cast("double") / col("n_pixels"))
      .withColumn("v_rg",
        col("s_rg2").cast("double") / col("n_pixels")
          - col("m_rg") * col("m_rg"))
      .withColumn("v_yb2",
        col("s_yb2sq").cast("double") / col("n_pixels")
          - col("m_yb2") * col("m_yb2"))
      .withColumn("colorfulness",
        sqrt(col("v_rg") + col("v_yb2") / lit(4.0))
          + lit(0.3) * sqrt(col("m_rg") * col("m_rg")
            + (col("m_yb2") / lit(2.0)) * (col("m_yb2") / lit(2.0))))
      .select(col("doc_id"), col("n_pixels"), col("colorfulness"))
  }

  /** SOBEL gradient-energy profile per image — the edge-content dial
    * next to [[imageBlur]]'s focus measure (blur asks "is the second
    * derivative alive?"; this asks "how much FIRST-derivative
    * structure is there, and along which axis?" — the text-scan /
    * banner / natural-photo discriminator: documents carry strongly
    * horizontal-dominant gradients). Per interior pixel the 3×3
    * Sobel pair G_x, G_y over the REAL decoded grayscale grid;
    * reported as exact integer energies ΣG_x², ΣG_y², their mean
    * energy, and the axis ratio. Sums fold INSIDE the decoder loop
    * as exact LONGs (the imageStats discipline); both derived
    * doubles are fixed-shape expressions over them (§4); axis ratio
    * is NULL when ΣG_y² = 0, never Inf. The oracle restates the full
    * 8-neighbor stencil from the pixel-synthesis formula via two
    * lag/lead window passes (row pass, then column pass over the row
    * pass's three columns). */
  def imageSobel(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("n_interior", LongType),
      StructField("sum_gx2", LongType), StructField("sum_gy2", LongType)))
    val rdd = media.filter(col("kind") === "image")
      .select("doc_id", "media").rdd.mapPartitions { rows =>
        rows.map { r =>
          val img = readImage(r.getAs[Array[Byte]](1))
          val (w, h) = (img.getWidth, img.getHeight)
          val g = Array.ofDim[Int](h, w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              g(y)(x) =
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
          var n = 0L; var sx2 = 0L; var sy2 = 0L
          y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val gx = (g(y - 1)(x + 1) + 2 * g(y)(x + 1) + g(y + 1)(x + 1)) -
                (g(y - 1)(x - 1) + 2 * g(y)(x - 1) + g(y + 1)(x - 1))
              val gy = (g(y + 1)(x - 1) + 2 * g(y + 1)(x) + g(y + 1)(x + 1)) -
                (g(y - 1)(x - 1) + 2 * g(y - 1)(x) + g(y - 1)(x + 1))
              n += 1
              sx2 += gx.toLong * gx
              sy2 += gy.toLong * gy
              x += 1
            }
            y += 1
          }
          Row(r.getLong(0), n, sx2, sy2)
        }
      }
    spark.createDataFrame(rdd, schema)
      .withColumn("grad_energy",
        (col("sum_gx2") + col("sum_gy2")).cast("double") / col("n_interior"))
      .withColumn("edge_ratio",
        when(col("sum_gy2") > 0,
          col("sum_gx2").cast("double") / col("sum_gy2").cast("double")))
  }

  /** Hamming near-dup pairs over [[imageDHash]] fingerprints via
    * 16-bit PIGEONHOLE bands (the simhash recipe): a pair within
    * hamming distance 3 differs in at most 3 of the 4 bands, so it
    * MUST agree on at least one — candidates come from a band-value
    * bucket join (never an all-pairs comparison), then one codegen'd
    * `bit_count(xor)` verifies the exact distance. At corpus scale
    * the shuffle carries 4 band rows per image and each bucket joins
    * only its own occupants — the LSH-shaped bound every dedup path
    * here shares. Output (doc_a, doc_b, hamming), doc_a < doc_b. */
  def dhashNearDupPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming=$maxHamming: 4 bands guarantee recall only up to hamming 3")
    val banded = hashes.select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
      explode(array(
        struct(lit(0).as("band"), col("dhash_lo").bitwiseAND(lit(0xffffL)).as("bv")),
        struct(lit(1).as("band"), shiftright(col("dhash_lo"), 16).as("bv")),
        struct(lit(2).as("band"), col("dhash_hi").bitwiseAND(lit(0xffffL)).as("bv")),
        struct(lit(3).as("band"), shiftright(col("dhash_hi"), 16).as("bv")))).as("bb"))
      .select(col("doc_id"), col("dhash_hi"), col("dhash_lo"),
        col("bb.band").as("band"), col("bb.bv").as("bv"))
    val a = banded.select(col("band"), col("bv"), col("doc_id").as("doc_a"),
      col("dhash_hi").as("ha"), col("dhash_lo").as("la"))
    val b = banded.select(col("band"), col("bv"), col("doc_id").as("doc_b"),
      col("dhash_hi").as("hb"), col("dhash_lo").as("lb"))
    a.join(b, Seq("band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(ha ^ hb) + bit_count(la ^ lb)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Per-window AUDIO features over the real PCM: each clip's samples
    * split into `nWindows` contiguous windows (sample i → window
    * i·W div total — the same integer rule the oracle restates), and
    * each window reports sample count, zero-crossing count (adjacent
    * sign changes whose BOTH samples sit in the window) and RMS
    * energy — the voice-activity / silence-trim profile an audio
    * pipeline computes before transcription. The decode is the real
    * JDK WAV path ([[features]]' audio branch); RMS is one sqrt over
    * an exact integer sum of squares, so the number is deterministic
    * bit-for-bit. Non-audio rows are ignored. */
  def audioFeatures(media: DataFrame, nWindows: Int = 4): DataFrame = {
    require(nWindows > 0, "audioFeatures needs at least one window")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("window_idx", LongType),
      StructField("n_samples", LongType),
      StructField("n_zero_cross", LongType),
      StructField("rms", DoubleType)))
    val rdd = media.select("doc_id", "media", "kind").rdd
      .filter(_.getString(2) == "audio")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          // the window math below indexes 16-bit mono little-endian
          // frames — a stereo or 8/24-bit clip would silently
          // interleave channels or mis-stride, and a streamed header
          // reporting NOT_SPECIFIED (-1) frames would blow the
          // allocation; refuse typed instead (review fix)
          val fmt = in.getFormat
          require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 &&
            in.getFrameLength >= 0 && !fmt.isBigEndian,
            s"audioFeatures expects 16-bit mono little-endian PCM with a known " +
              s"frame count, got channels=${fmt.getChannels} bits=${fmt.getSampleSizeInBits} " +
              s"bigEndian=${fmt.isBigEndian} frames=${in.getFrameLength}")
          val total = in.getFrameLength.toInt
          val pcm = new Array[Byte](total * 2)
          var read = 0
          while (read < pcm.length) {
            val k = in.read(pcm, read, pcm.length - read)
            if (k <= 0) read = pcm.length else read += k
          }
          in.close()
          def s(i: Int): Int = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
          val n = new Array[Long](nWindows)
          val zc = new Array[Long](nWindows)
          val sq = new Array[Long](nWindows)
          var i = 0
          while (i < total) {
            val w = (i.toLong * nWindows / total).toInt
            n(w) += 1
            sq(w) += s(i).toLong * s(i)
            if (i + 1 < total && ((i + 1).toLong * nWindows / total).toInt == w &&
              ((s(i) < 0) != (s(i + 1) < 0))) zc(w) += 1
            i += 1
          }
          (0 until nWindows).filter(n(_) > 0).map(w =>
            Row(r.getLong(0), w.toLong, n(w), zc(w),
              math.sqrt(sq(w).toDouble / n(w))))
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** LOW-ENERGY (silence-trim) profile per clip, composed over
    * [[audioFeatures]]'s real decoded windows: windows whose RMS sits
    * below `rmsFloor` count as quiet, and a clip whose quiet fraction
    * reaches `minQuietRatio` flags for trimming — the voice-activity
    * dial an audio pipeline reads before paying feature extraction on
    * dead air. The floor is a CONFIGURED parameter (a real corpus
    * sets it near its noise floor, ~100-500 for 16-bit speech; the
    * synthetic text-derived PCM here bottoms out at ~6.9k, so the
    * gate pins 7400 to exercise both branches). Ratios are exact
    * integer divisions in double; rms comparisons see bit-identical
    * operands on any engine (exact LONG square sums under one IEEE
    * sqrt). */
  def audioQuietProfile(media: DataFrame, nWindows: Int = 4,
                        rmsFloor: Double = 500.0,
                        minQuietRatio: Double = 0.5): DataFrame =
    audioFeatures(media, nWindows)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("rms") < rmsFloor, 1L).otherwise(0L)).as("n_quiet"))
      .withColumn("quiet_ratio", col("n_quiet").cast("double") / col("n_windows"))
      .withColumn("trim_flag", col("quiet_ratio") >= minQuietRatio)

  /** CLIPPING / PEAK profile per clip over the REAL decoded PCM — the
    * recording-chain QC next to [[audioQuietProfile]]'s dead-air one
    * (a clip whose samples pile up at the rail was distorted at
    * capture; no downstream feature extraction unhears that):
    * n_clipped = samples with |s| ≥ `clipCut`, the true peak |s|, and
    * the clipped fraction. Counts fold INSIDE the decode loop as
    * exact LONGs (the audioFeatures discipline — same 16-bit mono LE
    * guard); the ratio is one raw IEEE division (§4). The synthetic
    * corpus peaks at 16000 ((32−96)·250 — the space character), so
    * the default cut 15000 genuinely splits samples on both sides. */
  def audioClipping(media: DataFrame, clipCut: Int = 15000): DataFrame = {
    require(clipCut > 0 && clipCut <= 32767, s"clipCut in [1, 32767], got $clipCut")
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_samples", LongType),
      StructField("n_clipped", LongType),
      StructField("max_abs", LongType)))
    val rdd = media.select("doc_id", "media", "kind").rdd
      .filter(_.getString(2) == "audio")
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          val fmt = in.getFormat
          require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16 &&
            in.getFrameLength >= 0 && !fmt.isBigEndian,
            s"audioClipping expects 16-bit mono little-endian PCM with a known " +
              s"frame count, got channels=${fmt.getChannels} " +
              s"bits=${fmt.getSampleSizeInBits} bigEndian=${fmt.isBigEndian} " +
              s"frames=${in.getFrameLength}")
          val total = in.getFrameLength.toInt
          val pcm = new Array[Byte](total * 2)
          var read = 0
          while (read < pcm.length) {
            val k = in.read(pcm, read, pcm.length - read)
            if (k <= 0) read = pcm.length else read += k
          }
          in.close()
          var n = 0L; var clipped = 0L; var maxAbs = 0L
          var i = 0
          while (i < total) {
            val s = (((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort.toInt
              ).toLong
            val a = math.abs(s)
            n += 1
            if (a >= clipCut) clipped += 1
            if (a > maxAbs) maxAbs = a
            i += 1
          }
          Row(r.getLong(0), n, clipped, maxAbs)
        }
      }
    spark.createDataFrame(rdd, schema)
      .withColumn("clip_ratio",
        col("n_clipped").cast("double") / col("n_samples").cast("double"))
  }

  /** Decode [[frameSample]] output (doc_id, frame_idx, frame) — the
    * frames are PNG — back to per-frame pixel dims. Closes the video
    * evidence loop: AVI encode → container parse → JPEG decode → PNG
    * re-encode → PNG decode, with the oracle predicting every dim
    * from strlen(text) alone. */
  def frameMeta(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("width", LongType),
      StructField("height", LongType)))
    val rdd = frames.select("doc_id", "frame_idx", "frame").rdd.mapPartitions { rows =>
      rows.map { r =>
        val img = readImage(r.getAs[Array[Byte]](2))
        Row(r.getLong(0), r.getLong(1), img.getWidth.toLong, img.getHeight.toLong)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
