package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed by batched
  * per-partition transforms.
  *
  * DIMENSION extraction is real for self-describing containers
  * (PNG/GIF/BMP/PPM/WAV header sniffing — the production shape at corpus
  * scale, which never decodes pixels to learn a width); full PIXEL decode
  * remains a clearly-marked STUB — the real image/audio codecs are not in
  * this container — implemented as a deterministic fake (dimensions/frames
  * derived from the content digest) for unknown magic so every downstream
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

  /** REAL header sniffing for self-describing containers — no codec
    * library needed, and also the production shape: corpus-scale
    * dimension/duration extraction reads the first bytes of each blob,
    * it never decodes pixels or samples. Covers PNG (IHDR), GIF (logical
    * screen descriptor), BMP (BITMAPINFOHEADER), binary PPM (P6), and
    * WAV/RIFF (frame count from the data chunk). Unknown magic → None,
    * and the caller falls back to the declared deterministic stub, so
    * synthetic test payloads keep their digest-derived shapes. */
  private[graft] def sniffDimensions(
      bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def ascii(i: Int, n: Int): String =
      new String(bytes, i, n, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length >= 24 && u8(0) == 0x89 && ascii(1, 3) == "PNG")
      Some((be32(16), be32(20), 1))
    else if (bytes.length >= 10 &&
        (ascii(0, 6) == "GIF87a" || ascii(0, 6) == "GIF89a"))
      Some((le16(6), le16(8), 1))
    else if (bytes.length >= 26 && ascii(0, 2) == "BM") {
      // only the le32-dimension DIB headers — BITMAPINFOHEADER (40), the
      // V2/V3 alpha-mask variants (52/56), OS/2 BITMAPINFOHEADER2 (64),
      // V4 (108) and V5 (124) all store le32 width/height at offsets
      // 18/22; a BITMAPCOREHEADER (size 12, le16 dims) or corrupt size
      // field would make the raw le32 reads below return garbage — reject
      val dibSize = le32(14)
      val ok = Set(40, 52, 56, 64, 108, 124).contains(dibSize)
      val w = le32(18); val h = math.abs(le32(22)) // height < 0 = top-down
      if (ok && w > 0 && h > 0) Some((w, h, 1)) else None
    }
    else if (bytes.length >= 2 && ascii(0, 2) == "P6") {
      // ASCII header: P6 <ws> width <ws> height <ws> maxval, '#' comments
      var i = 2; var got = List.empty[Int]
      while (i < bytes.length && got.length < 2) {
        val c = u8(i)
        if (c == '#') { while (i < bytes.length && u8(i) != '\n') i += 1 }
        else if (Character.isDigit(c)) {
          var v = 0
          while (i < bytes.length && Character.isDigit(u8(i))) {
            v = v * 10 + (u8(i) - '0'); i += 1
          }
          got = got :+ v
        } else i += 1
      }
      got match { case w :: h :: Nil => Some((w, h, 1)); case _ => None }
    } else if (bytes.length >= 44 && ascii(0, 4) == "RIFF" &&
        ascii(8, 4) == "WAVE") {
      // walk chunks: need fmt (block align) then data (byte size)
      var i = 12; var blockAlign = 0; var frames = -1; var bad = false
      while (!bad && i + 8 <= bytes.length && frames < 0) {
        val id = ascii(i, 4); val sz = le32(i + 4)
        // le32 is signed: a chunk size with the high bit set (malformed /
        // hostile blob) reads back negative and would advance i by <= 0,
        // spinning this loop forever on an executor — bail. A huge
        // POSITIVE size is legitimate (sniffing reads only a blob's head,
        // so the final data chunk routinely extends past the bytes we
        // hold) but `8 + sz` overflows Int — advance in Long and clamp to
        // the end so the walk terminates instead of wrapping negative.
        if (sz < 0) bad = true
        else {
          if (id == "fmt " && i + 22 <= bytes.length)
            blockAlign = le16(i + 20)
          else if (id == "data" && blockAlign > 0)
            frames = sz / blockAlign
          // chunks are word-aligned
          val next = i.toLong + 8L + sz.toLong + (sz & 1)
          i = if (next > bytes.length) bytes.length else next.toInt
        }
      }
      if (frames >= 0) Some((0, 0, frames)) else None
    } else None
  }

  /** STUB decode for payloads [[sniffDimensions]] cannot identify: a real
    * implementation hands `bytes` to an image/audio codec. This
    * deterministic fake derives (width, height, frames) from the content
    * digest so tests can assert exact values. Swap this single function
    * for the codec call when the libs exist. */
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
        val (w, h, fr) = sniffDimensions(r.bytes)
          .getOrElse(decodeStub(dig, r.kind))
        MediaFeatures(r.media_id, r.kind, r.bytes.length, hex, w, h, fr)
      }
    }

  /** Frame sampling stub for video rows: every k-th frame index, capped.
    * Real impl would seek the container; the index arithmetic — the part
    * Spark sees — is identical. */
  def sampleFrameIndexes(nFrames: Int, every: Int, cap: Int): Seq[Int] =
    (0 until nFrames by math.max(1, every)).take(cap)
}
