package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextHash

/** One media item: opaque binary payload + typed metadata, the schema a
  * multimodal training pipeline carries image/audio/video in. */
case class MediaItem(doc_id: Long, kind: String, payload: Array[Byte],
                     declared_w: Int, declared_h: Int)

/** Extracted per-item features. */
case class MediaFeatures(doc_id: Long, kind: String, byte_len: Int,
                         checksum: Long, width: Int, height: Int,
                         n_frames: Int, histogram: Array[Long])

/** A resized media item (decode->resample->re-encode stubbed). */
case class ResizedMedia(doc_id: Long, kind: String, width: Int, height: Int,
                        src_w: Int, src_h: Int, checksum: Long)

/** One sampled frame of a video item. */
case class SampledFrame(doc_id: Long, frame_idx: Int, frame_checksum: Long)

/** Multimodal column plumbing: binary payloads with typed metadata,
  * processed per-partition in typed Datasets.
  *
  * The decode step is a STUB — image/audio codecs are not available in
  * this environment — but everything Spark-cares-about is real: the
  * binary column schema, the case-class encoders, the mapPartitions batch
  * shape (one iterator pass, no per-row task setup), and the deterministic
  * feature contract. Swap [[stubDecode]] for a real codec (e.g. javacpp
  * ffmpeg/opencv) without touching the plan.
  */
object Multimodal {

  /** Payloads synthesized from the documents table (the container has no
    * media files): utf-8 bytes standing in for an encoded frame. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"),
        (col("doc_id") % 640 + 1).cast("int").as("declared_w"),
        (col("doc_id") % 480 + 1).cast("int").as("declared_h"))
      .as[MediaItem]
  }

  /** STUB decode: deterministic pseudo-features derived from the payload
    * bytes. A real implementation would parse the container format here.
    * Kept per-partition so a real codec would amortize init cost
    * (context/library load) across the whole batch. */
  def stubDecode(item: MediaItem): MediaFeatures = {
    var h = 0xcbf29ce484222325L
    val hist = new Array[Long](8)
    var i = 0
    while (i < item.payload.length) {
      val b = item.payload(i) & 0xff
      h ^= b; h *= 0x100000001b3L
      hist(b & 7) += 1
      i += 1
    }
    val mixed = TextHash.mix64(h)
    MediaFeatures(item.doc_id, item.kind, item.payload.length, mixed,
      width = item.declared_w, height = item.declared_h,
      n_frames = if (item.kind == "video/mp4") (math.abs(mixed) % 240 + 1).toInt else 1,
      histogram = hist)
  }

  /** STUB resize to (w, h): a real implementation decodes, resamples and
    * re-encodes here; the stub keeps the plan shape (typed mapPartitions,
    * per-partition codec init point) and emits a checksum that is a
    * deterministic function of payload AND target dims, as a real
    * re-encode would be. */
  def resize(items: Dataset[MediaItem], w: Int, h: Int): Dataset[ResizedMedia] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        val f = stubDecode(m)
        ResizedMedia(m.doc_id, m.kind, w, h, m.declared_w, m.declared_h,
          TextHash.mix64(f.checksum ^ (w.toLong << 32) ^ h.toLong))
      }
    }
  }

  /** STUB frame sampling: every `everyK`-th frame of each video item
    * (images/audio yield no rows). One flatMap pass; a real codec would
    * seek/decode the sampled frames only. */
  def frameSample(items: Dataset[MediaItem], everyK: Int): Dataset[SampledFrame] = {
    import items.sparkSession.implicits._
    require(everyK > 0)
    items.flatMap { m =>
      if (m.kind != "video/mp4") Iterator.empty
      else {
        val f = stubDecode(m)
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
        it.map(stubDecode)
      }
      .toDF()
    val histCols = (0 until 8).map(i =>
      element_at(col("histogram"), i + 1).as(s"hist_$i"))
    feats
      .select(Seq(col("doc_id"), col("kind"), col("byte_len"), col("checksum"),
        col("width"), col("height"), col("n_frames")) ++ histCols: _*)
      .orderBy(col("doc_id"))
  }
}
