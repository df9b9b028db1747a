package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextHash

/** One media item: opaque binary payload + typed metadata, the schema a
  * multimodal training pipeline carries image/audio/video in. */
case class MediaItem(doc_id: Long, kind: String, payload: Array[Byte],
                     declared_w: Int, declared_h: Int)

/** Extracted per-item features. For images width/height come from the
  * PNG IHDR; for audio (width, height) carry (sample_rate,
  * bits_per_sample) from the WAV fmt chunk; for video n_frames derives
  * from the MP4 mvhd timescale/duration at 30 fps. */
case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
                         checksum: Long, width: Int, height: Int,
                         n_frames: Int, histogram: Array[Long])

/** A resized media item (decode->resample->re-encode stubbed). */
case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
                        src_w: Int, src_h: Int, checksum: Long)

/** One sampled frame of a video item. */
case class SampledFrame(doc_id: Long, frame_idx: Int, frame_checksum: Long)

/** Decode verdict for the quarantine path: parse success or the typed
  * rejection reason (doc-id prefix stripped so reasons group). */
case class MediaVerdict(doc_id: Long, kind: String, ok: Boolean,
                        error: String)

/** Byte-histogram entropy row of one decoded image ([[entropyStats]]'s
  * output shape; entropy/share are frac4-floored doubles). */
case class MmEntropy(doc_id: Long, n_bytes: Long, n_distinct: Long,
                     entropy: Double, top_byte_share: Double)

/** Per-channel pixel statistics of one decoded image (sums kept as
  * integers — no float accumulation order to disagree about). */
case class PixelStats(doc_id: Long, width: Long, height: Long,
                      r_min: Long, r_max: Long, r_sum: Long,
                      g_min: Long, g_max: Long, g_sum: Long,
                      b_min: Long, b_max: Long, b_sum: Long)

/** Sample statistics of one decoded 16-bit PCM clip (integer sums and
  * a sign-change count — nothing floating-point to disagree about). */
case class PcmStats(doc_id: Long, n_samples: Long, s_min: Long,
                    s_max: Long, s_sum: Long, n_sign_change: Long)

case class SpectralPeak(doc_id: Long, n_samples: Long, peak_bin: Long)

case class VadStats(doc_id: Long, n_frames: Long, n_active: Long,
                    n_segments: Long, longest_run: Long)

/** Multimodal column plumbing: binary payloads with typed metadata,
  * processed per-partition in typed Datasets.
  *
  * The payloads are REAL container formats, parsed for real: synthesized
  * PNG (signature + IHDR with a verified CRC32), WAV (RIFF/WAVE chunk
  * walk to `fmt `), and MP4 (ISO-BMFF box walk to moov/mvhd). The
  * sample decode (pixels / PCM / frame rasters) stays out of scope —
  * no image/audio codecs exist in this environment, and the payload
  * bodies are synthetic bytes, not valid deflate/PCM — but the header
  * fields every pipeline filters and routes on (dimensions, sample
  * rate, duration) are parsed from the actual byte layout, validated,
  * and wrong bytes fail loudly. Everything Spark-cares-about is real:
  * the binary column schema, the case-class encoders, the mapPartitions
  * batch shape (one iterator pass, per-partition codec-init point), and
  * the deterministic feature contract.
  */
object Multimodal {
  val VideoFps = 30
  val Mp4Timescale = 1000

  // ---- container synthesis (deterministic from doc_id + text) ----

  private def be32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v).array()

  /** Valid PNG prefix: 8-byte signature, IHDR (8-bit truecolor, real
    * CRC32), an IDAT carrying the synthetic body, IEND. */
  def pngPayload(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 64)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array())
    chunk("IDAT", body)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Paeth predictor (PNG spec 9.4): closest of left/above/upper-left
    * to a + b - c, ties broken a, then b. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** A FULLY VALID PNG: 8-bit truecolor pixels filtered per-row (filter
    * type cycles None/Sub/Up/Average/Paeth so every unfilter path is
    * exercised), deflate-compressed into zlib IDAT bytes (split across
    * two IDAT chunks when large enough — decoders must concatenate).
    * Unlike [[pngPayload]] (headers around opaque bytes, for the
    * header-parse pipeline), this one's sample data really decodes. */
  def pngPixelPayload(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h * 3, "need w*h RGB triplets")
    val rowBytes = w * 3
    val raw = new Array[Byte]((rowBytes + 1) * h)
    var y = 0
    while (y < h) {
      val ft = y % 5
      raw(y * (rowBytes + 1)) = ft.toByte
      var x = 0
      while (x < rowBytes) {
        val cur = pixels(y * rowBytes + x) & 0xff
        val a = if (x >= 3) pixels(y * rowBytes + x - 3) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * rowBytes + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) pixels((y - 1) * rowBytes + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (rowBytes + 1) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = zout.toByteArray

    val out = new java.io.ByteArrayOutputStream(z.length + 96)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte], off: Int, len: Int): Unit = {
      out.write(be32(len), 0, 4)
      val tb = typ.getBytes("US-ASCII")
      out.write(tb, 0, 4); out.write(data, off, len)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data, off, len)
      out.write(be32(crc.getValue.toInt), 0, 4)
    }
    chunk("IHDR", ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array(), 0, 13)
    val split = if (z.length > 64) 64 else z.length
    chunk("IDAT", z, 0, split)
    if (split < z.length) chunk("IDAT", z, split, z.length - split)
    chunk("IEND", Array.emptyByteArray, 0, 0)
    out.toByteArray
  }

  /** Full PNG sample decode, pure JVM: chunk walk (CRC32-verified),
    * IDAT concatenation, zlib inflate (`java.util.zip.Inflater` — no
    * native codec needed, the one image format where sample-level decode
    * is NOT env-blocked), and per-row unfiltering of all five PNG filter
    * types. Returns (width, height, RGB bytes). Malformed data throws
    * typed errors for the quarantine path. */
  def decodePngPixels(p: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isPng(p), "not a PNG")
    val (w, h) = parsePng(p)
    require(p(24) == 8 && p(25) == 2, "PNG: only 8-bit truecolor supported")
    // chunk walk: verify CRCs, concatenate IDAT payloads
    val zdata = new java.io.ByteArrayOutputStream()
    var i = 8L
    var done = false
    while (!done) {
      require(i + 8 <= p.length, "PNG: truncated chunk header")
      val len = i32be(p, i.toInt).toLong & 0xffffffffL
      val typ = tag(p, i.toInt + 4)
      require(i + 12 + len <= p.length, s"PNG: chunk $typ overruns payload")
      val crc = new java.util.zip.CRC32()
      crc.update(p, i.toInt + 4, 4 + len.toInt)
      require(crc.getValue.toInt == i32be(p, (i + 8 + len).toInt),
        s"PNG: $typ CRC mismatch")
      if (typ == "IDAT") zdata.write(p, i.toInt + 8, len.toInt)
      if (typ == "IEND") done = true
      i += 12 + len
    }
    val rowBytes = w * 3
    val raw = new Array[Byte]((rowBytes + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(zdata.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        require(n > 0 || !inf.needsInput, "PNG: truncated IDAT stream")
        off += n
      }
    } finally inf.end()
    require(off == raw.length, s"PNG: inflated $off of ${raw.length} bytes")
    // unfilter in place into the output pixel array
    val px = new Array[Byte](rowBytes * h)
    var y = 0
    while (y < h) {
      val ft = raw(y * (rowBytes + 1)) & 0xff
      require(ft <= 4, s"PNG: unknown filter type $ft")
      var x = 0
      while (x < rowBytes) {
        val f = raw(y * (rowBytes + 1) + 1 + x) & 0xff
        val a = if (x >= 3) px(y * rowBytes + x - 3) & 0xff else 0
        val b = if (y > 0) px((y - 1) * rowBytes + x) & 0xff else 0
        val c = if (x >= 3 && y > 0) px((y - 1) * rowBytes + x - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        px(y * rowBytes + x) = ((f + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  /** Valid WAV header: RIFF/WAVE with a 16-byte PCM `fmt ` chunk and a
    * `data` chunk carrying the synthetic body. */
  def wavPayload(sampleRate: Int, body: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(44 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + body.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16) // block align, bits/sample
    bb.put("data".getBytes("US-ASCII")); bb.putInt(body.length); bb.put(body)
    bb.array()
  }

  /** Valid JPEG prefix: SOI + APP0/JFIF + one SOF (baseline FFC0 or
    * progressive FFC2 — both carry dims the same way) + SOS + entropy
    * body + EOI. Fixed 45-byte framing overhead (2+18+13+10+2). */
  def jpegPayload(w: Int, h: Int, progressive: Boolean,
                  body: Array[Byte]): Array[Byte] = {
    require(w >= 1 && w <= 0xffff && h >= 1 && h <= 0xffff)
    val bb = ByteBuffer.allocate(45 + body.length)
    bb.putShort(0xffd8.toShort) // SOI
    bb.putShort(0xffe0.toShort).putShort(16) // APP0, JFIF 1.1, 1x1, no thumb
    bb.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    bb.putShort(0x0101.toShort).put(0.toByte)
    bb.putShort(1).putShort(1).putShort(0)
    bb.putShort((if (progressive) 0xffc2 else 0xffc0).toShort) // SOFn
    bb.putShort(11).put(8.toByte) // len, precision
    bb.putShort(h.toShort).putShort(w.toShort)
    bb.put(1.toByte).put(1.toByte).put(0x11.toByte).put(0.toByte) // 1 comp
    bb.putShort(0xffda.toShort).putShort(8) // SOS
    bb.put(1.toByte).put(1.toByte).put(0.toByte)
    bb.put(0.toByte).put(63.toByte).put(0.toByte)
    bb.put(body)
    bb.putShort(0xffd9.toShort) // EOI
    bb.array()
  }

  /** Valid ISO-BMFF prefix: ftyp + moov(mvhd v0 with timescale and
    * duration) + mdat carrying the synthetic body. */
  def mp4Payload(durationMs: Int, body: Array[Byte]): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length); bb.put(typ.getBytes("US-ASCII"))
      bb.put(payload); bb.array()
    }
    val mvhd = ByteBuffer.allocate(100) // version 0 layout, trailing zeros
      .putInt(0)              // version + flags
      .putInt(0).putInt(0)    // ctime, mtime
      .putInt(Mp4Timescale).putInt(durationMs)
      .array()
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++ "isomiso2".getBytes("US-ASCII"))
    ftyp ++ box("moov", box("mvhd", mvhd)) ++ box("mdat", body)
  }

  /** Payloads synthesized from the documents table (the container has no
    * media files): real PNG/WAV/MP4 container bytes around the doc text
    * standing in for the encoded samples. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image/png"), lit("audio/wav"),
          lit("video/mp4"), lit("image/jpeg")),
          (col("doc_id") % 4 + 1).cast("int")).as("kind"),
        col("text"),
        (col("doc_id") % 640 + 1).cast("int").as("declared_w"),
        (col("doc_id") % 480 + 1).cast("int").as("declared_h"))
      .as[(Long, String, String, Int, Int)]
      .map { case (id, kind, text, w, h) =>
        val body = text.getBytes("UTF-8")
        val payload = kind match {
          case "image/png"  => pngPayload(w, h, body)
          case "audio/wav"  => wavPayload(8000 + (id % 8000).toInt, body)
          case "video/mp4"  => mp4Payload(1000 + (id % 8000).toInt, body)
          // half the corpus baseline, half progressive — both SOF paths
          case _            => jpegPayload(w, h, id % 8 == 7, body)
        }
        MediaItem(id, kind, payload, w, h)
      }
  }

  // ---- container parsing ----

  private def u16le(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def i32le(p: Array[Byte], i: Int): Int =
    ByteBuffer.wrap(p, i, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
  private def i32be(p: Array[Byte], i: Int): Int =
    ByteBuffer.wrap(p, i, 4).getInt
  private def tag(p: Array[Byte], i: Int): String =
    new String(p, i, 4, "US-ASCII")

  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 33 && (p(0) & 0xff) == 0x89 && tag(p, 1).startsWith("PNG")
  private def isWav(p: Array[Byte]): Boolean =
    p.length >= 44 && tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE"
  private def isMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && tag(p, 4) == "ftyp"
  private def isJpeg(p: Array[Byte]): Boolean =
    p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8

  private def u16be(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)

  /** JPEG segment walk to the first SOFn marker -> (width, height).
    * Handles every dims-bearing SOF (baseline C0, extended C1,
    * progressive C2, lossless C3, differential C5-C7/C9-CB/CD-CF);
    * skips everything else by its declared length with the same
    * bounds-before-use discipline as [[parseWav]]/[[parseMp4]] —
    * marker lengths are attacker-controlled. Scanning stops at SOS
    * (entropy-coded data follows, where FF bytes are no longer
    * markers). */
  def parseJpeg(p: Array[Byte]): (Int, Int) = {
    var i = 2L
    while (i + 4 <= p.length) {
      require((p(i.toInt) & 0xff) == 0xff, "JPEG: lost marker alignment")
      val m = p(i.toInt + 1) & 0xff
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0xd9 || m == 0xda)
        throw new IllegalArgumentException("JPEG: no SOF before SOS/EOI")
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2 // standalone
      else {
        val len = u16be(p, i.toInt + 2)
        require(len >= 2 && i + 2 + len <= p.length,
          "JPEG: segment overruns payload")
        val isSof = m >= 0xc0 && m <= 0xcf &&
          m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          require(len >= 8, "JPEG: SOF segment too small")
          return (u16be(p, i.toInt + 7), u16be(p, i.toInt + 5))
        }
        i += 2 + len
      }
    }
    throw new IllegalArgumentException("JPEG: no SOF before SOS/EOI")
  }

  /** PNG IHDR parse with CRC32 verification -> (width, height). */
  def parsePng(p: Array[Byte]): (Int, Int) = {
    require(i32be(p, 8) == 13 && tag(p, 12) == "IHDR",
      "PNG: first chunk is not a 13-byte IHDR")
    val crc = new java.util.zip.CRC32()
    crc.update(p, 12, 4 + 13)
    require(crc.getValue.toInt == i32be(p, 29), "PNG: IHDR CRC mismatch")
    (i32be(p, 16), i32be(p, 20))
  }

  /** RIFF chunk walk to `fmt ` -> (sample_rate, bits_per_sample).
    * Sizes are unsigned 32-bit: cursor math runs in Long so a crafted
    * size near 2^31 throws the typed error instead of wrapping the Int
    * cursor backwards (non-termination) or out of bounds. */
  def parseWav(p: Array[Byte]): (Int, Int) = {
    var i = 12L
    while (i + 8 <= p.length) {
      val id = tag(p, i.toInt); val size = i32le(p, i.toInt + 4).toLong & 0xffffffffL
      require(i + 8 + size <= p.length, s"WAV: chunk size $size overruns payload")
      if (id == "fmt ") {
        require(size >= 16, "WAV: fmt chunk too small")
        return (i32le(p, i.toInt + 12), u16le(p, i.toInt + 22))
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException("WAV: no fmt chunk")
  }

  /** ISO-BMFF box walk to moov/mvhd -> (timescale, duration). Same
    * Long-cursor discipline as [[parseWav]]: box sizes are unsigned and
    * attacker-controlled, so every advance is bounds-checked before use. */
  def parseMp4(p: Array[Byte]): (Int, Int) = {
    var i = 0L
    while (i + 8 <= p.length) {
      val size = i32be(p, i.toInt).toLong & 0xffffffffL; val typ = tag(p, i.toInt + 4)
      require(size >= 8 && i + size <= p.length, s"MP4: bad box size $size")
      if (typ == "moov") {
        var j = i + 8
        while (j + 8 <= i + size) {
          val bs = i32be(p, j.toInt).toLong & 0xffffffffL
          require(bs >= 8 && j + bs <= i + size, s"MP4: bad inner box size $bs")
          if (tag(p, j.toInt + 4) == "mvhd") {
            // version(1)+flags(3)+ctime(4)+mtime(4)+timescale(4)+duration(4)
            // = 20 body bytes: anything shorter would read the next box's
            // bytes as timescale/duration (or run off the payload)
            require(bs >= 28, s"MP4: mvhd box too small ($bs)")
            require(p(j.toInt + 8) == 0, "MP4: only mvhd version 0 supported")
            return (i32be(p, j.toInt + 20), i32be(p, j.toInt + 24))
          }
          j += bs
        }
        throw new IllegalArgumentException("MP4: moov has no mvhd")
      }
      i += size
    }
    throw new IllegalArgumentException("MP4: no moov box")
  }

  /** Decode: sniff the container by magic (never trust the declared
    * kind), parse the real header fields, and derive the payload-level
    * checksum/histogram features. Malformed containers throw — a
    * training pipeline must quarantine them, not ingest garbage. */
  def decode(item: MediaItem): MediaFeatures = {
    val p = item.payload
    val (w, h, frames) =
      if (isPng(p)) { val (pw, ph) = parsePng(p); (pw, ph, 1) }
      else if (isWav(p)) { val (rate, bits) = parseWav(p); (rate, bits, 1) }
      else if (isMp4(p)) {
        val (ts, dur) = parseMp4(p)
        require(ts > 0, "MP4: zero timescale")
        (item.declared_w, item.declared_h,
          math.max(1, (dur.toLong * VideoFps / ts).toInt))
      }
      else if (isJpeg(p)) { val (jw, jh) = parseJpeg(p); (jw, jh, 1) }
      else throw new IllegalArgumentException(
        s"doc ${item.doc_id}: unrecognized container magic")
    var hsh = 0xcbf29ce484222325L
    val hist = new Array[Long](8)
    var i = 0
    while (i < p.length) {
      val b = p(i) & 0xff
      hsh ^= b; hsh *= 0x100000001b3L
      hist(b & 7) += 1
      i += 1
    }
    MediaFeatures(item.doc_id, item.kind, p.length, TextHash.mix64(hsh),
      width = w, height = h, n_frames = frames, histogram = hist)
  }

  /** The quarantine pass [[decode]]'s contract demands: try-parse every
    * item, route failures to a typed reject row instead of failing the
    * job — one malformed file among billions must cost one row, not a
    * task retry storm. Same one-iterator mapPartitions shape as
    * [[features]]; the error string is the parser's own typed message
    * (stable classes like "PNG: IHDR CRC mismatch"), so rejects group by
    * cause for triage. */
  def quarantine(items: Dataset[MediaItem]): Dataset[MediaVerdict] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        try { decode(m); MediaVerdict(m.doc_id, m.kind, ok = true, "") }
        catch {
          // NonFatal, not just IllegalArgumentException: the contract is
          // "a bad file costs one row", and a parser bug surfacing as an
          // index error on some adversarial payload must not become a
          // task-retry storm either
          case scala.util.control.NonFatal(e) =>
            MediaVerdict(m.doc_id, m.kind, ok = false,
              Option(e.getMessage)
                .getOrElse(e.getClass.getSimpleName)
                .replaceAll("^(requirement failed: )?(doc \\d+: )?", ""))
        }
      }
    }
  }

  /** The media table with deterministic corruption planted (doc_id % 17
    * == 0 truncated to 10 bytes, % 17 == 5 with bytes 8-11 stomped) —
    * the fixture for exercising [[quarantine]] on realistic damage:
    * truncation kills every container's magic; the stomp breaks PNG's
    * IHDR length and WAV's WAVE tag but leaves MP4 readable (it only
    * hits the ftyp brand), so some damage is rightly survivable. */
  def corruptedMediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    mediaTable(spark, dir).map { m =>
      if (m.doc_id % 17 == 0) m.copy(payload = m.payload.take(10))
      else if (m.doc_id % 17 == 5) {
        val p = m.payload.clone()
        var i = 8
        while (i < 12 && i < p.length) { p(i) = 'X'.toByte; i += 1 }
        m.copy(payload = p)
      } else m
    }
  }

  /** Resize to (w, h): the raster resample/re-encode would slot between
    * decode and the checksum; the emitted checksum is a deterministic
    * function of payload AND target dims, as a real re-encode would be.
    * Typed mapPartitions keeps the per-partition codec-init point. */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val f = decode(m)
        ResizedMedia(m.doc_id, m.kind, w, h, f.width, f.height,
          TextHash.mix64(f.checksum ^ (w.toLong << 32) ^ h.toLong))
      }
    }
  }

  /** Frame sampling: every `everyK`-th frame of each video item
    * (images/audio yield no rows), frame count from the parsed mvhd
    * duration. One flatMap pass; a real codec would seek/decode the
    * sampled frames only. */
  def frameSample(items: Dataset[MediaItem], everyK: Int): Dataset[SampledFrame] = {
    import items.sparkSession.implicits._
    require(everyK > 0)
    items.flatMap { m =>
      if (m.kind != "video/mp4") Iterator.empty
      else {
        val f = decode(m)
        (0 until f.n_frames by everyK).iterator.map(i =>
          SampledFrame(m.doc_id, i, TextHash.mix64(f.checksum + i)))
      }
    }
  }

  /** Feature extraction over the media table: one mapPartitions pass with
    * typed encoders (binary never leaves the executor as anything but the
    * input column; output rows are small fixed-width features). The
    * 8-bucket histogram is emitted as scalar columns hist_0..hist_7 —
    * the verification harness sorts/hashes values and cannot order array
    * cells. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val feats = mediaTable(spark, dir)
      .mapPartitions { it =>
        // real codecs would initialize once per partition here
        it.map(decode)
      }
      .toDF()
    val histCols = (0 until 8).map(i =>
      element_at(col("histogram"), i + 1).as(s"hist_$i"))
    feats
      .select(Seq(col("doc_id"), col("kind"), col("byte_len"), col("checksum"),
        col("width"), col("height"), col("n_frames")) ++ histCols: _*)
      .orderBy(col("doc_id"))
  }

  /** Real 16-bit PCM decode, pure JVM: validate the RIFF/WAVE framing,
    * require 16-bit PCM from the fmt chunk, walk to `data`, and read
    * the little-endian int16 samples. Same Long-cursor discipline as
    * [[parseWav]]; malformed framing throws typed errors for the
    * quarantine path. */
  def decodeWavPcm(p: Array[Byte]): Array[Short] = {
    require(isWav(p), "not a WAV")
    val (_, bits) = parseWav(p)
    require(bits == 16, s"WAV: only 16-bit PCM supported, got $bits")
    var i = 12L
    while (i + 8 <= p.length) {
      val id = tag(p, i.toInt)
      val size = i32le(p, i.toInt + 4).toLong & 0xffffffffL
      require(i + 8 + size <= p.length, s"WAV: chunk size $size overruns payload")
      if (id == "data") {
        require(size % 2 == 0, "WAV: odd data size for 16-bit samples")
        val out = new Array[Short]((size / 2).toInt)
        var j = 0
        while (j < out.length) {
          out(j) = u16le(p, i.toInt + 8 + j * 2).toShort
          j += 1
        }
        return out
      }
      i += 8 + size + (size & 1)
    }
    throw new IllegalArgumentException("WAV: no data chunk")
  }

  /** The audio subset (same doc_id % 4 kind split as [[mediaTable]])
    * carrying FULLY DECODABLE 16-bit PCM: every sample is closed-form
    * in (doc_id, i) — s_i = ((doc_id*31 + i*7919) mod 65536) - 32768 —
    * so an engine with no audio stack states the expected sample
    * statistics exactly, while the Spark side must round-trip the real
    * RIFF framing and int16 byte order to recover them. */
  def pcmMediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 4 === 1)
      .as[Long]
      .map { id =>
        val n = (200 + id % 800).toInt
        val bb = ByteBuffer.allocate(n * 2).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          bb.putShort((((id * 31 + i.toLong * 7919) % 65536) - 32768).toShort)
          i += 1
        }
        MediaItem(id, "audio/wav", wavPayload(8000, bb.array()), 0, 0)
      }
  }

  /** Sample statistics over the decoded PCM clips — the amplitude
    * range/DC-offset/sign-activity summary an audio-data pipeline
    * computes per clip for normalization and silence/clipping triage.
    * The decode is the real thing ([[decodeWavPcm]]: RIFF walk + int16
    * LE), and the DuckDB oracle restates the closed-form sample
    * function, so a byte-order or chunk-walk defect breaks the hash.
    * Integer stats only; sign changes count adjacent pairs whose
    * (s < 0) flags differ. Same scale shape as [[pixelStats]]. */
  def pcmStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pcmMediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { m =>
          val s = decodeWavPcm(m.payload)
          var mn = Long.MaxValue; var mx = Long.MinValue
          var sum = 0L; var chg = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            if (v < mn) mn = v
            if (v > mx) mx = v
            sum += v
            if (i > 0 && (s(i) < 0) != (s(i - 1) < 0)) chg += 1
            i += 1
          }
          PcmStats(m.doc_id, s.length.toLong, mn, mx, sum, chg)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Energy-threshold VOICE-ACTIVITY segmentation over the decoded PCM
    * clips — the speech-data triage every audio curation pipeline runs
    * before paying for transcription (silence-heavy and wall-of-noise
    * clips are budget sinks; segment structure is the routing signal):
    * 160-sample frames (10 ms at 16 kHz), a frame is ACTIVE iff its
    * mean |amplitude| clears the threshold — stated integer-exactly as
    * sum|v| > threshold · frame_len, so there is no division anywhere
    * — and activity collapses to per-clip segment structure (active
    * frames, maximal runs, longest run). The decode is the real RIFF
    * walk ([[decodeWavPcm]]); the DuckDB oracle restates the
    * closed-form sample function and rebuilds the same runs with a
    * gaps-and-islands window, so a decode or framing defect breaks the
    * hash. Scale shape: one typed mapPartitions pass, fixed-width
    * output rows, the run scan is O(samples) per clip; binary never
    * leaves the executor. */
  def pcmVad(spark: SparkSession, dir: String, frame: Int = 160,
             threshold: Long = 16384L): DataFrame = {
    import spark.implicits._
    pcmMediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { m =>
          val s = decodeWavPcm(m.payload)
          val nf = (s.length + frame - 1) / frame
          var segs = 0L; var nAct = 0L; var longest = 0L; var run = 0L
          var f = 0
          while (f < nf) {
            val from = f * frame
            val until = math.min(from + frame, s.length)
            var sa = 0L
            var j = from
            while (j < until) { sa += math.abs(s(j).toLong); j += 1 }
            if (sa > threshold * (until - from)) {
              nAct += 1; run += 1
              if (run > longest) longest = run
              if (run == 1) segs += 1
            } else run = 0
            f += 1
          }
          VadStats(m.doc_id, nf.toLong, nAct, segs, longest)
        }
      }
      .toDF()
      .withColumn("active_frac",
        floor(col("n_active") / col("n_frames") * 10000.0 + 0.5) / 10000.0)
      .orderBy(col("doc_id"))
  }

  /** DuckDB restatement of [[pcmVad]]: the closed-form sample
    * function, the same integer frame-energy rule, runs rebuilt with
    * the standard gaps-and-islands window. */
  def pcmVadOracle(frame: Int = 160, threshold: Long = 16384L): String =
    s"""WITH a AS (SELECT doc_id, 200 + doc_id % 800 AS n FROM documents
         WHERE doc_id % 4 = 1),
       s AS (SELECT doc_id,
           CAST(floor(i / $frame) AS BIGINT) AS f,
           abs((doc_id * 31 + i * 7919) % 65536 - 32768) AS av
         FROM a, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) t),
       fr AS (SELECT doc_id, f, sum(av) AS sa,
           CAST(count(*) AS BIGINT) AS len
         FROM s GROUP BY doc_id, f),
       fl AS (SELECT doc_id, f,
           CASE WHEN sa > $threshold * len THEN 1 ELSE 0 END AS act
         FROM fr),
       isl AS (SELECT doc_id, f, act,
           f - row_number() OVER (PARTITION BY doc_id, act ORDER BY f)
             AS grp
         FROM fl),
       runs AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS rl
         FROM isl WHERE act = 1 GROUP BY doc_id, grp),
       base AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(act) AS BIGINT) AS n_active
         FROM fl GROUP BY doc_id),
       rr AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
           CAST(max(rl) AS BIGINT) AS longest_run
         FROM runs GROUP BY doc_id)
       SELECT b.doc_id, b.n_frames, b.n_active,
         coalesce(rr.n_segments, CAST(0 AS BIGINT)) AS n_segments,
         coalesce(rr.longest_run, CAST(0 AS BIGINT)) AS longest_run,
         floor(CAST(b.n_active AS DOUBLE) / b.n_frames * 10000.0 + 0.5)
           / 10000.0 AS active_frac
       FROM base b LEFT JOIN rr USING (doc_id) ORDER BY doc_id"""

  /** The audio subset carrying PURE SINE tones: each clip is exactly
    * one cycle-aligned sinusoid — N = 256 samples, planted DFT bin
    * 3 + doc_id % 60, amplitude 8000 + (doc_id % 8)·1000 — so its
    * spectrum is two exact spikes and the dominant bin is closed-form
    * in doc_id alone. The WAV framing is the real [[wavPayload]]
    * container, so the whole synth → RIFF → decode → DFT chain is
    * exercised end to end. */
  def sineMediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 4 === 1)
      .as[Long]
      .map { id =>
        val n = 256
        val bin = (3 + id % 60).toInt
        val amp = (8000 + (id % 8) * 1000).toDouble
        val bb = ByteBuffer.allocate(n * 2).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          bb.putShort(math.round(
            amp * math.sin(2.0 * math.Pi * bin * i / n)).toShort)
          i += 1
        }
        MediaItem(id, "audio/wav", wavPayload(8000, bb.array()), 0, 0)
      }
  }

  /** Dominant-frequency detection over the decoded clips — the tone /
    * band-energy feature an audio curation pipeline extracts per clip
    * (voice-activity bands, hum detection, codec-artifact triage): a
    * Goertzel scan over every DFT bin 1..N/2-1 and the argmax power
    * bin. The decode is the real RIFF walk ([[decodeWavPcm]]); for the
    * cycle-aligned [[sineMediaTable]] tones the winning bin equals the
    * planted one EXACTLY (all signal energy lands in a single bin, and
    * int16 quantization noise is ~80 dB down), so the oracle restates
    * the integer answer closed-form — any defect in the synth, the
    * container round-trip, or the DFT recurrence moves the argmax.
    *
    * Scale shape: per-partition kernel, O(N²) per clip with N fixed at
    * 256 (the mapInPandas-batch shape a real FFT would slot into);
    * narrow map, no shuffle, output one row per clip. */
  def spectralPeak(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sineMediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { m =>
          val s = decodeWavPcm(m.payload)
          val n = s.length
          var best = -1L
          var bestP = -1.0
          var b = 1
          while (b <= n / 2 - 1) {
            // Goertzel recurrence for bin b over the full clip
            val wc = 2.0 * math.cos(2.0 * math.Pi * b / n)
            var s1 = 0.0; var s2 = 0.0
            var i = 0
            while (i < n) {
              val s0 = s(i) + wc * s1 - s2
              s2 = s1; s1 = s0
              i += 1
            }
            val p = s1 * s1 + s2 * s2 - wc * s1 * s2
            if (p > bestP) { bestP = p; best = b }
            b += 1
          }
          SpectralPeak(m.doc_id, n.toLong, best)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Per-image BYTE-HISTOGRAM SHANNON ENTROPY over the decoded pixels
    * — the information-content quality filter of a vision corpus
    * ([[graft.operators.TextAnalysis]]'s text_quality analog): flat
    * fills, letterboxes, and solid-color junk score near 0 bits/byte,
    * photographic content near 8, so "entropy < τ" is the first-pass
    * cut a multimodal curation stack runs after decode. Also emits the
    * distinct-byte count and the top-byte share (a spike there is the
    * other junk signature — one dominant background value).
    *
    * Decode is the real PNG path ([[decodePngPixels]]); the histogram
    * fold runs in fixed bin order inside the codec boundary, entropy
    * sums float-cast (the nDCG discipline: per-term log2 last-ulp
    * noise and bin-order differences both vanish at float precision)
    * then frac4-floored, so the DuckDB oracle's GROUP BY restatement
    * from the closed-form pixel function hashes bit-identically.
    * Scale: one map-side pass per image, output one row per image —
    * no shuffle anywhere before the presentation sort. */
  def entropyStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pixelMediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { m =>
          val px = decodePngPixels(m.payload)._3
          val counts = new Array[Long](256)
          var i = 0
          while (i < px.length) { counts(px(i) & 0xff) += 1; i += 1 }
          val n = px.length.toDouble
          var hAcc = 0.0
          var nDistinct = 0L
          var cMax = 0L
          var b = 0
          while (b < 256) {
            val c = counts(b)
            if (c > 0) {
              nDistinct += 1
              if (c > cMax) cMax = c
              val p = c / n
              hAcc -= p * (math.log(p) / math.log(2.0))
            }
            b += 1
          }
          MmEntropy(m.doc_id, px.length.toLong, nDistinct,
            math.floor(hAcc.toFloat.toDouble * 1e4 + 0.5) / 1e4,
            math.floor(cMax / n * 1e4 + 0.5) / 1e4)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** The image subset (same doc_id % 4 kind split as [[mediaTable]])
    * carrying FULLY DECODABLE pixel data: dimensions and every pixel
    * byte are closed-form in doc_id, so an engine with no image codec
    * can still state the expected pixel statistics exactly — while the
    * Spark side must round-trip real zlib + PNG filtering to recover
    * them. */
  def pixelMediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 4 === 0)
      .as[Long]
      .map { id =>
        val w = (4 + id % 13).toInt; val h = (4 + id % 11).toInt
        val px = Array.tabulate(w * h * 3)(i =>
          ((id * 31 + i.toLong * 7919) % 256).toByte)
        MediaItem(id, "image/png", pngPixelPayload(w, h, px), w, h)
      }
  }

  /** Per-channel pixel statistics over the decoded images — the
    * mean/extrema summary a vision-data pipeline computes per sample for
    * normalization and outlier triage. The decode is the real thing
    * ([[decodePngPixels]]: inflate + unfilter), not a header parse; the
    * DuckDB oracle recomputes the same stats from the closed-form pixel
    * function, so any decode defect (wrong filter inverse, dropped IDAT
    * chunk, off-by-one scanline) breaks the hash match. Integer sums,
    * not float means: nothing to disagree about across engines. Same
    * scale shape as [[features]]: one typed mapPartitions pass,
    * fixed-width output rows, binary stays on the executor. */
  def pixelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pixelMediaTable(spark, dir)
      .mapPartitions { it =>
        it.map { m =>
          val (w, h, px) = decodePngPixels(m.payload)
          val mins = Array(255L, 255L, 255L)
          val maxs = Array(0L, 0L, 0L)
          val sums = Array(0L, 0L, 0L)
          var i = 0
          while (i < px.length) {
            val c = i % 3; val v = (px(i) & 0xff).toLong
            if (v < mins(c)) mins(c) = v
            if (v > maxs(c)) maxs(c) = v
            sums(c) += v
            i += 1
          }
          PixelStats(m.doc_id, w, h,
            mins(0), maxs(0), sums(0),
            mins(1), maxs(1), sums(1),
            mins(2), maxs(2), sums(2))
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Image table with PLANTED DUPLICATE STRUCTURE for perceptual
    * dedup: each image renders one of 7 deterministic two-tone scenes
    * (scene = doc_id % 7; per dHash cell, a scene-keyed multiplicative
    * hash picks dark 60 or light 180 — smooth gradients would leave
    * most adjacent-cell comparisons identical across scenes) at a
    * per-image brightness offset (doc_id % 5 * 10, bounded so no
    * channel wraps). dHash is invariant to a uniform brightness
    * shift — cell sums all move by offset x cell-size, so every
    * adjacent-cell comparison is unchanged — which makes "same scene"
    * the closed-form ground truth for the hash clusters. Fixed 18 x 16
    * dims so the 9 x 8 grid has equal 2 x 2 cells (unequal cells would
    * break the shift invariance of integer cell sums). */
  def dhashMediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 4 === 0)
      .as[Long]
      .map { id =>
        val w = 18; val h = 16
        val scene = (id % 7) + 1; val off = (id % 5).toInt * 10
        val px = Array.tabulate(w * h * 3) { i =>
          val p = i / 3; val cellIdx = (p / w / 2) * 9 + (p % w) / 2
          val light = ((scene * 0x9E3779B97F4A7C15L) >>> (cellIdx % 47) & 1L) == 1L
          ((if (light) 180 else 60) + off).toByte
        }
        MediaItem(id, "image/png", pngPixelPayload(w, h, px), w, h)
      }
  }

  /** 64-bit difference hash of a decoded RGB image: 9 x 8 grid of
    * equal cells, each cell's integer RGB sum compared against its
    * right neighbor — the classic perceptual fingerprint (robust to
    * uniform brightness change, cheap enough to compute inline). */
  private[graft] def dhash64(w: Int, h: Int, px: Array[Byte]): Long = {
    val cw = w / 9; val ch = h / 8
    require(cw * 9 == w && ch * 8 == h, s"dims $w x $h must tile the 9x8 grid")
    val cells = Array.ofDim[Long](8, 9)
    var i = 0
    while (i < px.length) {
      val p = i / 3; val x = p % w; val y = p / w
      cells(y / ch)(x / cw) += (px(i) & 0xff).toLong
      i += 1
    }
    var bits = 0L; var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r)(c) > cells(r)(c + 1)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** Perceptual image dedup: REAL PNG decode -> [[dhash64]] -> exact
    * hash clusters with keep-min survivors — the image-side counterpart
    * of [[graft.operators.Dedup.exact]], except the key is a perceptual
    * fingerprint of DECODED PIXELS, so brightness-shifted re-exports of
    * the same scene collapse into one cluster while distinct scenes
    * stay apart. The oracle states ground truth closed-form (clusters
    * == scenes): a broken filter inverse, a dropped IDAT byte, or a
    * dHash that loses its shift invariance all scatter the clusters and
    * break the hash match.
    *
    * Scale shape: one typed mapPartitions decode pass (binary never
    * leaves the executor), then a hash-group join — the cluster frame
    * is one row per DISTINCT perceptual hash (corpus / dup-factor),
    * broadcast back like the exact-dedup survivor frame. */
  def dhashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed = dhashMediaTable(spark, dir)
      .mapPartitions(_.map { m =>
        val (w, h, px) = decodePngPixels(m.payload)
        (m.doc_id, dhash64(w, h, px))
      })
      .toDF("doc_id", "dhash")
    val clusters = hashed.groupBy(col("dhash"))
      .agg(min(col("doc_id")).as("cluster_rep"),
        count(lit(1)).as("n_dups"))
    hashed.join(broadcast(clusters), Seq("dhash"))
      .select(col("doc_id"), col("cluster_rep"), col("n_dups"),
        (col("doc_id") === col("cluster_rep")).as("survivor"))
      .orderBy(col("doc_id"))
  }
}
