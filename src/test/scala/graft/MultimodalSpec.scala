package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaItem, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("media table carries binary payloads with typed metadata") {
    val ds = Multimodal.mediaTable(spark, sf)
    val row = ds.head()
    assert(row.payload.nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(row.kind))
    assert(row.declared_w >= 1 && row.declared_h >= 1)
  }

  test("stub decode is deterministic and histogram sums to byte length") {
    val item = MediaItem(7, "image/png", "hello world".getBytes("UTF-8"), 10, 10)
    val f1 = Multimodal.stubDecode(item)
    val f2 = Multimodal.stubDecode(item)
    assert(f1 == f2 || (f1.checksum == f2.checksum && f1.byte_len == f2.byte_len))
    assert(f1.histogram.sum == f1.byte_len)
    assert(f1.n_frames == 1) // not video
  }

  test("features runs distributed and matches row count") {
    val n = Multimodal.features(spark, sf).count()
    assert(n == graft.Tables.documents(spark, sf).count())
  }

  test("resize stub keeps identity and varies checksum with target dims") {
    val items = Multimodal.mediaTable(spark, sf)
    val a = Multimodal.resize(items, 224, 224).collect()
    val b = Multimodal.resize(items, 64, 64).collect()
    assert(a.length == b.length && a.nonEmpty)
    assert(a.forall(r => r.width == 224 && r.height == 224))
    val ca = a.map(r => r.doc_id -> r.checksum).toMap
    b.foreach(r => assert(ca(r.doc_id) != r.checksum))
  }

  test("frame sampling yields every k-th frame for videos only") {
    val items = Multimodal.mediaTable(spark, sf)
    val frames = Multimodal.frameSample(items, 10).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 10 == 0))
    val videoIds = Multimodal.features(spark, sf).collect()
      .filter(_.getString(1) == "video/mp4").map(_.getLong(0)).toSet
    assert(frames.map(_.doc_id).toSet == videoIds)
  }

  test("video items get frame counts, others single frame") {
    val rows = Multimodal.features(spark, sf).collect()
    rows.foreach { r =>
      val kind = r.getString(1); val frames = r.getInt(6)
      if (kind == "video/mp4") assert(frames >= 1 && frames <= 240)
      else assert(frames == 1)
    }
  }
}
