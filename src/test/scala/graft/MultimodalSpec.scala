package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaItem, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  test("media table carries binary payloads with typed metadata") {
    val ds = Multimodal.mediaTable(spark, sf)
    val row = ds.head()
    assert(row.payload.nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4", "image/jpeg")
      .contains(row.kind))
    assert(row.declared_w >= 1 && row.declared_h >= 1)
  }

  test("PNG IHDR parse returns the encoded dimensions and verifies the CRC") {
    val p = Multimodal.pngPayload(321, 87, "pixels".getBytes("UTF-8"))
    val f = Multimodal.decode(MediaItem(1, "image/png", p, 10, 10))
    // parsed from the container, NOT the declared metadata
    assert(f.width == 321 && f.height == 87 && f.n_frames == 1)
    // corrupt one IHDR byte -> the CRC check must reject it
    val bad = p.clone(); bad(17) = (bad(17) ^ 0x1).toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.decode(MediaItem(1, "image/png", bad, 10, 10))
    }
    assert(e.getMessage.contains("CRC"))
  }

  test("WAV fmt parse returns sample rate and bit depth via the chunk walk") {
    val p = Multimodal.wavPayload(44100, "pcm".getBytes("UTF-8"))
    val f = Multimodal.decode(MediaItem(2, "audio/wav", p, 10, 10))
    assert(f.width == 44100 && f.height == 16 && f.n_frames == 1)
  }

  test("MP4 mvhd parse derives the frame count from timescale and duration") {
    val p = Multimodal.mp4Payload(4000, "samples".getBytes("UTF-8"))
    val f = Multimodal.decode(MediaItem(3, "video/mp4", p, 10, 10))
    assert(f.n_frames == 4000 * Multimodal.VideoFps / Multimodal.Mp4Timescale)
    assert(Multimodal.parseMp4(p) == (Multimodal.Mp4Timescale, 4000))
  }

  test("decode sniffs magic and rejects unrecognized containers") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.decode(MediaItem(4, "image/png",
        "not a container at all........................................"
          .getBytes("UTF-8"), 10, 10))
    }
    assert(e.getMessage.contains("unrecognized"))
  }

  test("decode is deterministic and histogram sums to byte length") {
    val item = MediaItem(7, "image/png",
      Multimodal.pngPayload(10, 10, "hello world".getBytes("UTF-8")), 10, 10)
    val f1 = Multimodal.decode(item)
    val f2 = Multimodal.decode(item)
    assert(f1.checksum == f2.checksum && f1.byte_len == f2.byte_len)
    assert(f1.histogram.sum == f1.byte_len)
    assert(f1.n_frames == 1) // not video
  }

  test("features runs distributed and matches row count") {
    val n = Multimodal.features(spark, sf).count()
    assert(n == graft.Tables.documents(spark, sf).count())
  }

  test("features carry container-parsed fields for every kind") {
    Multimodal.features(spark, sf).collect().foreach { r =>
      val (id, kind) = (r.getLong(0), r.getString(1))
      kind match {
        case "image/png" => // IHDR dims == the synthesized declared dims
          assert(r.getInt(4) == (id % 640 + 1).toInt &&
            r.getInt(5) == (id % 480 + 1).toInt)
        case "audio/wav" => // fmt sample rate, 16-bit PCM
          assert(r.getInt(4) == 8000 + (id % 8000).toInt && r.getInt(5) == 16)
        case "image/jpeg" => // SOF dims == the synthesized declared dims
          assert(r.getInt(4) == (id % 640 + 1).toInt &&
            r.getInt(5) == (id % 480 + 1).toInt && r.getInt(6) == 1)
        case _ => // mvhd duration 1000..8999 ms at 30 fps
          assert(r.getInt(6) == (1000 + id % 8000) * 30 / 1000)
      }
    }
  }

  test("JPEG SOF parse returns dims for baseline and progressive frames") {
    for (prog <- Seq(false, true)) {
      val p = Multimodal.jpegPayload(641, 479, prog, "scan".getBytes("UTF-8"))
      val f = Multimodal.decode(MediaItem(11, "image/jpeg", p, 10, 10))
      assert(f.width == 641 && f.height == 479 && f.n_frames == 1)
      assert(f.byte_len == 45 + 4) // the fixed framing overhead
    }
    // SOF0 vs SOF2 really differ in the marker byte
    val b = Multimodal.jpegPayload(8, 8, false, Array.emptyByteArray)
    val pr = Multimodal.jpegPayload(8, 8, true, Array.emptyByteArray)
    assert((b(20) & 0xff) == 0xff && (b(21) & 0xff) == 0xc0)
    assert((pr(21) & 0xff) == 0xc2)
  }

  test("JPEG walk rejects truncation and missing SOF with typed errors") {
    val p = Multimodal.jpegPayload(100, 50, false, "x".getBytes("UTF-8"))
    val e1 = intercept[IllegalArgumentException] {
      Multimodal.parseJpeg(p.take(10))
    }
    assert(e1.getMessage.contains("overruns"))
    // SOI + EOI only: structurally valid, but no SOF to take dims from
    val e2 = intercept[IllegalArgumentException] {
      Multimodal.parseJpeg(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte))
    }
    assert(e2.getMessage.contains("no SOF"))
    // stomping bytes 8-11 (the APP0 identifier) must NOT matter: the
    // walk skips APP0 by declared length — mirrors the quarantine oracle
    val stomped = p.clone()
    (8 until 12).foreach(i => stomped(i) = 'X'.toByte)
    assert(Multimodal.parseJpeg(stomped) == (100, 50))
  }

  test("resize keeps identity and varies checksum with target dims") {
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
      if (kind == "video/mp4") assert(frames >= 30 && frames <= 270)
      else assert(frames == 1)
    }
  }

  test("PNG pixel decode round-trips every filter type bit-exactly") {
    // h = 7 cycles all five filters (None/Sub/Up/Average/Paeth + wrap);
    // adversarial pixel pattern: ramps, constants, and alternating bytes
    val w = 5; val h = 7
    val px = Array.tabulate(w * h * 3) { i =>
      (i % 3 match {
        case 0 => i % 256            // ramp (exercises Sub/Paeth deltas)
        case 1 => 0xAB               // constant (exercises Up)
        case 2 => if ((i / 3) % 2 == 0) 0 else 255 // alternating extremes
      }).toByte
    }
    val encoded = Multimodal.pngPixelPayload(w, h, px)
    val (dw, dh, out) = Multimodal.decodePngPixels(encoded)
    assert(dw == w && dh == h)
    assert(out.sameElements(px), "decoded pixels differ from source")
  }

  test("PNG pixel decode concatenates split IDAT chunks and checks CRCs") {
    // large enough that pngPixelPayload splits the zlib stream in two
    val w = 16; val h = 11
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val encoded = Multimodal.pngPixelPayload(w, h, px)
    val nIdat = {
      var n = 0; var i = 8
      while (i + 8 <= encoded.length) {
        val len = java.nio.ByteBuffer.wrap(encoded, i, 4).getInt
        if (new String(encoded, i + 4, 4, "US-ASCII") == "IDAT") n += 1
        i += 12 + len
      }
      n
    }
    assert(nIdat == 2, s"expected a split IDAT stream, got $nIdat chunk(s)")
    val (_, _, out) = Multimodal.decodePngPixels(encoded)
    assert(out.sameElements(px))
    // flip one IDAT byte: CRC check must reject, not decode garbage
    val damaged = encoded.clone()
    damaged(8 + 12 + 13 + 8 + 5) = (damaged(8 + 12 + 13 + 8 + 5) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodePngPixels(damaged)
    }
    assert(e.getMessage.contains("CRC"), e.getMessage)
  }

  test("pixelStats equals the closed-form pixel function") {
    val rows = Multimodal.pixelStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = (4 + id % 13).toInt; val h = (4 + id % 11).toInt
      assert(r.getLong(1) == w && r.getLong(2) == h)
      val n = w * h * 3
      val expected = Array.fill(3)((255L, 0L, 0L)).toBuffer
      for (i <- 0 until n) {
        val c = i % 3; val v = (id * 31 + i.toLong * 7919) % 256
        val (mn, mx, s) = expected(c)
        expected(c) = (math.min(mn, v), math.max(mx, v), s + v)
      }
      for (c <- 0 until 3) {
        val (mn, mx, s) = expected(c)
        assert(r.getLong(3 + c * 3) == mn, s"doc $id ch $c min")
        assert(r.getLong(4 + c * 3) == mx, s"doc $id ch $c max")
        assert(r.getLong(5 + c * 3) == s, s"doc $id ch $c sum")
      }
    }
  }

  test("PCM decode round-trips int16 byte order and chunk framing") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val wav = Multimodal.wavPayload(8000, bb.array())
    assert(Multimodal.decodeWavPcm(wav).toSeq == samples.toSeq)
    // framing defects throw typed errors, not garbage samples
    val truncated = wav.take(wav.length - 3)
    assertThrows[IllegalArgumentException](Multimodal.decodeWavPcm(truncated))
  }

  test("pcmStats equals the closed-form sample function") {
    val rows = Multimodal.pcmStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (200 + id % 800).toInt
      val vs = (0 until n).map(i => (id * 31 + i.toLong * 7919) % 65536 - 32768)
      assert(r.getLong(1) == n.toLong, s"doc $id n_samples")
      assert(r.getLong(2) == vs.min && r.getLong(3) == vs.max, s"doc $id extrema")
      assert(r.getLong(4) == vs.sum, s"doc $id sum")
      val chg = vs.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(r.getLong(5) == chg.toLong, s"doc $id sign changes")
    }
  }

  test("pcmVad equals the closed-form frame segmentation") {
    val rows = Multimodal.pcmVad(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = (200 + id % 800).toInt
      val vs = (0 until n).map(i =>
        math.abs((id * 31 + i.toLong * 7919) % 65536 - 32768))
      val frames = vs.grouped(160).toSeq
      val act = frames.map(f => f.sum > 16384L * f.length)
      assert(r.getLong(1) == frames.length.toLong, s"doc $id n_frames")
      assert(r.getLong(2) == act.count(identity).toLong, s"doc $id n_active")
      // maximal runs of active frames
      val runs = act.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      assert(r.getLong(3) == runs.length.toLong, s"doc $id n_segments")
      assert(r.getLong(4) == (if (runs.isEmpty) 0L else runs.max.toLong),
        s"doc $id longest_run")
      assert(r.getDouble(5) == math.floor(
        act.count(identity).toDouble / frames.length * 1e4 + 0.5) / 1e4)
    }
    // the segmentation is non-degenerate on this corpus: both active
    // and inactive frames exist somewhere
    assert(rows.exists(_.getLong(2) > 0) &&
      rows.exists(r => r.getLong(2) < r.getLong(1)))
  }

  test("spectral peak recovers the planted bin through the RIFF round-trip") {
    val rows = Multimodal.spectralPeak(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 256L, s"doc $id n_samples")
      assert(r.getLong(2) == 3 + id % 60,
        s"doc $id: Goertzel argmax missed the planted tone")
    }
    // off-schedule sanity: a two-tone clip must pick the louder bin
    val n = 256
    val bb = java.nio.ByteBuffer.allocate(n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach { i =>
      val v = 9000.0 * math.sin(2 * math.Pi * 11 * i / n) +
        3000.0 * math.sin(2 * math.Pi * 40 * i / n)
      bb.putShort(math.round(v).toShort)
    }
    val s = Multimodal.decodeWavPcm(Multimodal.wavPayload(8000, bb.array()))
    val powers = (1 until n / 2).map { b =>
      val wc = 2.0 * math.cos(2.0 * math.Pi * b / n)
      var s1 = 0.0; var s2 = 0.0
      s.foreach { v => val s0 = v + wc * s1 - s2; s2 = s1; s1 = s0 }
      b -> (s1 * s1 + s2 * s2 - wc * s1 * s2)
    }
    assert(powers.maxBy(_._2)._1 == 11, "two-tone argmax")
  }

  test("dhash64: brightness-shift invariant, scene-separating") {
    def scenePx(scene: Long, off: Int): Array[Byte] =
      Array.tabulate(18 * 16 * 3) { i =>
        val p = i / 3; val cellIdx = (p / 18 / 2) * 9 + (p % 18) / 2
        val light = ((scene * 0x9E3779B97F4A7C15L) >>> (cellIdx % 47) & 1L) == 1L
        ((if (light) 180 else 60) + off).toByte
      }
    val hashes = (1L to 7L).map(s =>
      s -> Multimodal.dhash64(18, 16, scenePx(s, 0))).toMap
    assert(hashes.values.toSet.size == 7, "all 7 scenes must hash apart")
    (1L to 7L).foreach { s =>
      Seq(10, 20, 30, 40).foreach { off =>
        assert(Multimodal.dhash64(18, 16, scenePx(s, off)) == hashes(s),
          s"scene $s not invariant under +$off brightness")
      }
    }
  }

  test("entropyStats: equals the closed-form recompute through the real decode; bounds hold") {
    val rows = Multimodal.entropyStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(id % 4 == 0)
      // regenerate the synthetic byte stream and recompute with the
      // operator's own discipline (fixed bin order, float-cast, frac4)
      val w = (4 + id % 13).toInt; val h = (4 + id % 11).toInt
      val n = w * h * 3
      val counts = new Array[Long](256)
      (0 until n).foreach(i => counts(((id * 31 + i.toLong * 7919) % 256).toInt) += 1)
      var hAcc = 0.0; var nd = 0L; var cMax = 0L
      (0 until 256).foreach { b =>
        val c = counts(b)
        if (c > 0) {
          nd += 1; if (c > cMax) cMax = c
          val p = c / n.toDouble
          hAcc -= p * (math.log(p) / math.log(2.0))
        }
      }
      assert(r.getLong(1) == n.toLong, s"doc $id n_bytes")
      assert(r.getLong(2) == nd, s"doc $id n_distinct")
      assert(r.getDouble(3) ==
        math.floor(hAcc.toFloat.toDouble * 1e4 + 0.5) / 1e4, s"doc $id entropy")
      assert(r.getDouble(4) ==
        math.floor(cMax / n.toDouble * 1e4 + 0.5) / 1e4, s"doc $id share")
      // information-theoretic bounds: 0 <= H <= log2(distinct values),
      // and the top-byte share can never undercut the uniform floor
      assert(r.getDouble(3) >= 0.0 &&
        r.getDouble(3) <= math.log(nd.toDouble) / math.log(2.0) + 1e-4,
        s"doc $id entropy outside [0, log2(n_distinct)]")
      assert(r.getDouble(4) >= 1.0 / nd - 1e-4, s"doc $id share floor")
    }
    // the quality signal is discriminative on this corpus: sizes vary,
    // so entropies do too (a constant column would be a vacuous filter)
    assert(rows.map(_.getDouble(3)).distinct.length > 1)
  }

  test("dhashDedup: clusters equal the planted scene structure through " +
    "the real decode") {
    val rows = Multimodal.dhashDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    val byScene = ids.groupBy(_ % 7)
    rows.foreach { r =>
      val scene = r.getLong(0) % 7
      assert(r.getLong(1) == byScene(scene).min, "rep = min id of the scene")
      assert(r.getLong(2) == byScene(scene).length.toLong, "cluster size")
      assert(r.getBoolean(3) == (r.getLong(0) == byScene(scene).min))
    }
  }
}
