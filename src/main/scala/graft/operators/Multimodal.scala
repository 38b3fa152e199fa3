package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition transforms.
  *
  * The DECODE step is a clearly-marked STUB — the real image/audio codecs
  * are not in this container — implemented as a deterministic fake
  * (dimensions/frames derived from the content digest) so every downstream
  * shape is testable. Everything around it is the real Spark plumbing:
  * typed Datasets with product encoders, mapPartitions batching (one
  * MessageDigest per partition, not per row — the exact shape a JNI codec
  * handle needs), and a schema that survives a shuffle.
  *
  * Scale notes: media bytes never act as a join/group key — features are
  * extracted in a single narrow pass and the (small) feature rows flow on
  * while the blobs stay behind. At 100 TB the media column lives in its
  * own parquet files (binary columns dominate row-group size); feature
  * extraction is scan → mapPartitions → write, no shuffle at all.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      bytes: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      digest: String,
      width: Int,
      height: Int,
      n_frames: Int)

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB decode: a real implementation hands `bytes` to an image/audio
    * codec. This deterministic fake derives (width, height, frames) from
    * the content digest so tests can assert exact values. Swap this single
    * function for the codec call when the libs exist. */
  private def decodeStub(digest: Array[Byte], kind: String): (Int, Int, Int) = {
    def b(i: Int): Int = digest(i) & 0xff
    kind match {
      case "image" => (64 + b(0) * 8, 64 + b(1) * 8, 1)
      case "video" => (64 + b(0) * 8, 64 + b(1) * 8, 1 + b(2))
      case _       => (0, 0, 1 + b(2)) // audio: frames = sample blocks
    }
  }

  /** Batched feature extraction: one digest instance per PARTITION (the
    * expensive-handle pattern), streaming rows through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] =
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        md.reset()
        val dig = md.digest(r.bytes)
        val hex = dig.map(x => f"${x & 0xff}%02x").mkString
        val (w, h, fr) = decodeStub(dig, r.kind)
        MediaFeatures(r.media_id, r.kind, r.bytes.length, hex, w, h, fr)
      }
    }

  /** Frame sampling stub for video rows: every k-th frame index, capped.
    * Real impl would seek the container; the index arithmetic — the part
    * Spark sees — is identical. */
  def sampleFrameIndexes(nFrames: Int, every: Int, cap: Int): Seq[Int] =
    (0 until nFrames by math.max(1, every)).take(cap)
}
