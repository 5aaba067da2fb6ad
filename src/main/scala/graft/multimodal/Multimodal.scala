package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches — the Spark-side
  * shape a real decoder (image/audio libs) would plug into.
  *
  * The decode itself is STUBBED: this container ships no media
  * libraries, so the "decoder" derives deterministic pseudo-metadata
  * (md5 checksum, length-derived dims) from the payload bytes. The
  * schema, the binary column flow, the per-partition batching, and the
  * partitioning are real and tested — a true decoder changes only the
  * closure body marked below.
  */
object Multimodal {

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("checksum", StringType)))

  /** Attach a deterministic fake binary payload (the UTF-8 text bytes)
    * so the pipeline flows a real binary column. */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"))

  /** Feature extraction over the binary column: a deterministic
    * `dim`-float pseudo-embedding per payload (byte histogram folded
    * into dim buckets, L2-normalized) — the stub stand-in for an image
    * encoder. Output (vec_id, v: array<double>) plugs directly into
    * [[graft.vector.VectorOps]] (cosine top-k / LSH), completing the
    * media → embedding → similarity-search pipeline shape. */
  def fakeFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val rdd = media.select("doc_id", "media").rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](dim)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) % dim) += 1.0; i += 1 }
        var n2 = 0.0
        hist.foreach(x => n2 += x * x)
        val norm = math.sqrt(n2)
        val v = if (norm > 0) hist.map(_ / norm) else hist
        Row(r.getLong(0), v.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Resize" over the binary column — the batch shape of an image
    * resize: binary in, (smaller) binary out, metadata updated, one
    * transformer instance per partition. The stub truncates payloads
    * to `maxBytes` deterministically; a real resize changes only the
    * marked line. */
  def fakeResize(media: DataFrame, maxBytes: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("kind", StringType),
      StructField("media", BinaryType),
      StructField("n_bytes", LongType)))
    val rdd = media.select("doc_id", "media", "kind").rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        // ??? real resize goes here — stub truncates to maxBytes
        val out = java.util.Arrays.copyOf(bytes, math.min(bytes.length, maxBytes))
        Row(r.getLong(0), r.getString(2), out, out.length.toLong)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Frame sampling" — the explode shape of video processing: ONE
    * binary row fans out to `nFrames` frame rows (doc_id, frame_idx,
    * frame binary). The stub slices the payload into equal windows; a
    * real sampler changes only the marked line. Fan-out lives inside
    * the iterator (no driver materialization), so a partition streams
    * frames at bounded memory whatever the video count. */
  def frameSample(media: DataFrame, nFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("frame", BinaryType)))
    val rdd = media.select("doc_id", "media").rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val win = math.max(1, bytes.length / nFrames)
        (0 until nFrames).iterator.map { f =>
          // ??? real frame decode goes here — stub slices a byte window
          val from = math.min(f * win, bytes.length)
          val until = math.min(from + win, bytes.length)
          Row(id, f.toLong, java.util.Arrays.copyOfRange(bytes, from, until))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Per-partition batched "decode": one decoder instance per
    * partition (held by the closure, exactly where a JNI/py decoder
    * handle would live), rows processed as a streaming iterator. */
  def fakeDecode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("doc_id", "media", "kind").rdd.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5") // per-partition "decoder"
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val kind = r.getString(2)
        digest.reset()
        val checksum = digest.digest(bytes).map("%02x".format(_)).mkString
        // ??? real decode goes here — stub derives dims from payload size
        Row(id, kind, bytes.length.toLong, (bytes.length % 640).toLong,
          (bytes.length % 480).toLong, checksum)
      }
    }
    spark.createDataFrame(rdd, decodedSchema)
  }
}
