package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaFeatures, MediaRow}

/** Multimodal binary-column plumbing: typed Dataset in, typed features
  * out, deterministic stub decode, schema survives a shuffle. */
class MultimodalSpec extends SparkTestBase {

  private def mediaDs = {
    val spk = spark
    import spk.implicits._
    spk.createDataset(Seq(
      MediaRow(1L, "image", "fake-png-bytes-aaaa".getBytes("UTF-8")),
      MediaRow(2L, "image", "fake-png-bytes-bbbb".getBytes("UTF-8")),
      MediaRow(3L, "audio", "fake-wav-bytes".getBytes("UTF-8")),
      MediaRow(4L, "video", "fake-mp4-bytes".getBytes("UTF-8"))))
  }

  test("feature extraction is deterministic and typed end-to-end") {
    val f1 = Multimodal.extractFeatures(mediaDs).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(mediaDs).collect().sortBy(_.media_id)
    assert(f1.toSeq === f2.toSeq, "stub decode must be deterministic")
    assert(f1.map(_.media_id).toSeq === Seq(1L, 2L, 3L, 4L))
    f1.foreach { f =>
      assert(f.digest.length === 32) // md5 hex
      assert(f.n_bytes > 0)
      if (f.kind == "image") { assert(f.width >= 64 && f.n_frames === 1) }
      if (f.kind == "audio") { assert(f.width === 0 && f.n_frames >= 1) }
      if (f.kind == "video") { assert(f.n_frames >= 1) }
    }
    // same bytes -> same digest; different bytes -> different
    assert(f1(0).digest !== f1(1).digest)
  }

  test("features survive a shuffle (schema + encoder round-trip)") {
    val spk = spark
    import spk.implicits._
    val grouped = Multimodal.extractFeatures(mediaDs)
      .groupByKey(_.kind)
      .mapGroups((kind, it) => (kind, it.map(_.n_bytes.toLong).sum))
      .collect().toMap
    assert(grouped.keySet === Set("image", "audio", "video"))
    assert(grouped("image") === ("fake-png-bytes-aaaa".length * 2).toLong)
  }

  test("frame sampling stub: every k-th index, capped") {
    assert(Multimodal.sampleFrameIndexes(10, 3, 100) === Seq(0, 3, 6, 9))
    assert(Multimodal.sampleFrameIndexes(1000, 10, 5) === Seq(0, 10, 20, 30, 40))
    assert(Multimodal.sampleFrameIndexes(0, 5, 10) === Seq())
  }

  test("q_multimodal_frames' SQL count formula equals sampleFrameIndexes exactly") {
    // the graded query computes min(cap, (n-1) div every + 1) in SQL on
    // both engines; it must agree with the Scala sampler for every n
    (1 to 1000).foreach { n =>
      assert(math.min(20, (n - 1) / 5 + 1) === Multimodal.sampleFrameIndexes(n, 5, 20).size,
        s"formula diverges from sampler at n=$n")
    }
  }

  test("header sniffing reads real dimensions from PNG/GIF/BMP/PPM/WAV bytes") {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Int) = Array[Byte](
      v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    // PNG: signature + IHDR length/type + width/height (big-endian)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(480) ++ Array[Byte](8, 2)
    assert(Multimodal.sniffDimensions(png) === Some((640, 480, 1)))
    // GIF: signature + little-endian logical screen size
    val gif = "GIF89a".getBytes ++ le16(320) ++ le16(200) ++ Array[Byte](0, 0, 0)
    assert(Multimodal.sniffDimensions(gif) === Some((320, 200, 1)))
    // BMP: BITMAPINFOHEADER (DIB size 40 at offset 14) with negative
    // (top-down) height
    val bmp = "BM".getBytes ++ new Array[Byte](12) ++ le32(40) ++
      le32(800) ++ le32(-600) ++ new Array[Byte](4)
    assert(Multimodal.sniffDimensions(bmp) === Some((800, 600, 1)))
    // BITMAPCOREHEADER (DIB size 12, le16 dims) would be misread by the
    // le32 path — must be rejected, not returned as garbage dimensions
    val bmpCore = "BM".getBytes ++ new Array[Byte](12) ++ le32(12) ++
      le16(800) ++ le16(600) ++ new Array[Byte](8)
    assert(Multimodal.sniffDimensions(bmpCore) === None)
    // the V3 alpha-mask variant (DIB size 56) stores le32 dims at the
    // same offsets as size 40 and must be read, not stubbed
    val bmpV3 = "BM".getBytes ++ new Array[Byte](12) ++ le32(56) ++
      le32(1280) ++ le32(720) ++ new Array[Byte](4)
    assert(Multimodal.sniffDimensions(bmpV3) === Some((1280, 720, 1)))
    // corrupt INFOHEADER with zero width -> rejected
    val bmpZero = "BM".getBytes ++ new Array[Byte](12) ++ le32(40) ++
      le32(0) ++ le32(600) ++ new Array[Byte](4)
    assert(Multimodal.sniffDimensions(bmpZero) === None)
    // binary PPM with a comment line between the fields
    val ppm = "P6\n# a comment 99\n1024 768\n255\n".getBytes ++
      Array[Byte](0, 0, 0)
    assert(Multimodal.sniffDimensions(ppm) === Some((1024, 768, 1)))
    // WAV: RIFF/WAVE, fmt chunk (blockAlign=4 at +20), data chunk of 4000
    // bytes -> 1000 frames
    val fmtBody = le16(1) ++ le16(2) ++ le32(44100) ++ le32(176400) ++
      le16(4) ++ le16(16)
    val wav = "RIFF".getBytes ++ le32(36 + 4000) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ fmtBody ++
      "data".getBytes ++ le32(4000) ++ new Array[Byte](8)
    assert(Multimodal.sniffDimensions(wav) === Some((0, 0, 1000)))
    // hostile RIFF blob: a chunk size of 0xFFFFFFF8 reads back as a
    // negative le32; the chunk walk must bail (return None), not advance
    // by zero/negative and hang the executor task forever
    val wavEvil = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xFFFFFFF8) ++ new Array[Byte](16)
    assert(Multimodal.sniffDimensions(wavEvil) === None)
    // huge POSITIVE chunk size: 8 + sz overflows Int into a negative
    // advance — must also be rejected, not looped on or thrown from
    val wavHuge = "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0x7FFFFFF8) ++ new Array[Byte](16)
    assert(Multimodal.sniffDimensions(wavHuge) === None)
    // unknown magic falls back to the declared stub (None here)
    assert(Multimodal.sniffDimensions("not a container".getBytes) === None)
    // end-to-end: a sniffable payload flows through extractFeatures with
    // its REAL dimensions, an opaque one keeps the digest-derived fake
    val spk = spark
    import spk.implicits._
    val ds = spk.createDataset(Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "image", "opaque".getBytes)))
    val out = Multimodal.extractFeatures(ds).collect()
      .map(f => f.media_id -> ((f.width, f.height, f.n_frames))).toMap
    assert(out(1L) === ((640, 480, 1)))
    assert(out(2L)._1 >= 64, "opaque payload must keep the stub shape")
  }
}
