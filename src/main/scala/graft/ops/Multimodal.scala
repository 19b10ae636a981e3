package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary`
 * columns with typed metadata, processed per-partition (the Scala
 * analogue of a batched Pandas UDF: one iterator per partition, codec
 * state initialized once per partition, records streamed through).
 *
 * The actual media codecs are NOT present in this environment, so
 * `decodeImage` is a clearly-marked stub and `extractFeatures` uses a
 * deterministic byte-level fake — the Spark-side contract (binary
 * schema, partition iteration, typed output) is real and tested.
 */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)

  case class MediaFeatures(doc_id: Long, n_bytes: Int, head_byte: Int, content_md5: String)

  case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** REAL image decoding would go here (libjpeg/ffmpeg etc. — not in
    * this container). Deliberately unimplemented. */
  def decodeImage(bytes: Array[Byte]): Nothing =
    throw new NotImplementedError(
      "decodeImage: media codecs unavailable in this environment (stub)")

  /**
   * Per-partition feature extraction over a binary content column.
   * Deterministic byte-level features stand in for codec output; the
   * MessageDigest is allocated once per partition (the pattern a real
   * decoder handle would use).
   */
  def extractFeatures(df: DataFrame, idCol: String, contentCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          md.reset()
          val digest = md.digest(if (bytes == null) Array.emptyByteArray else bytes)
          MediaFeatures(
            doc_id = id,
            n_bytes = if (bytes == null) 0 else bytes.length,
            head_byte = if (bytes != null && bytes.nonEmpty) bytes(0) & 0xff else -1,
            content_md5 = digest.map("%02x".format(_)).mkString)
        }
      }
  }

  /**
   * Deterministic "frame sampling": split the payload into `frames`
   * contiguous byte slices (the partitioning/batching shape of real
   * video frame extraction; the decode itself is the stubbed part).
   */
  def sampleFrames(df: DataFrame, idCol: String, contentCol: String, frames: Int): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val step = math.max(1, bytes.length / frames)
          (0 until frames).iterator
            .map(i => (i, i * step))
            .takeWhile(_._2 < bytes.length)
            .map { case (i, off) =>
              Frame(id, i, java.util.Arrays.copyOfRange(bytes, off, math.min(off + step, bytes.length)))
            }
        }
      }
  }
}
