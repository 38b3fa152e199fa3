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
}
