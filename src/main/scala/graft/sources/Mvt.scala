package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Mapbox Vector Tile (MVT v2) protobuf encoding — the actual wire
  * format a ram-vt consumer touches (ram-vt/index.js:31-38 shells out
  * to tippecanoe; ram-vt/app/index.js:60-103 uploads the binary
  * `.mvt` tile tree). [[VectorTiles]] produces the quantized tile
  * CONTENT; this module serializes it to the published protobuf
  * contract (github.com/mapbox/vector-tile-spec/tree/master/2.1) with
  * a from-scratch varint/zigzag writer — no native dependency, no
  * generated stubs.
  *
  * Wire layout (all public spec): a Tile is repeated Layer (field 3);
  * a Layer carries name (1), repeated Feature (2), the deduplicated
  * keys (3) / values (4) tables, extent (5) and version=2 (15); a
  * Feature carries id (1), packed tags as (key-idx, value-idx) pairs
  * (2), geom type (3) and the packed command-integer geometry (4).
  * All three spec geometry types encode/decode: POINT (MoveTo(n)),
  * LINESTRING (MoveTo(1) + LineTo(n-1) per path) and POLYGON
  * (MoveTo(1) + LineTo(n-1) + ClosePath per ring, exterior-positive
  * winding normalized on encode) — the three source types ram-vt
  * tiles (results points, road-network lines, admin-bounds polygons;
  * ram-vt/app/index.js:74-88). Parameters are zigzagged deltas from a
  * cursor that runs across parts. Fields serialize in ascending
  * field-number order and features in ascending id order, so tile
  * bytes are DETERMINISTIC — the spec pins them against
  * hand-assembled fixtures, and the decoder below is
  * field-order-agnostic like any conforming reader.
  *
  * Scale posture: encoding is per-tile local work after the same
  * single repartition-by-tile-key shuffle the GeoJSONL sink uses; a
  * tile's feature list is bounded by design (the per-tile cap is
  * tippecanoe's drop-features analog), so the gather of one tile onto
  * one row is bounded, never corpus-sized.
  */
object Mvt {

  // ---- protobuf primitives ------------------------------------------

  private def putVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v = v >>> 7
    }
    out.write(v.toInt)
  }

  /** zigzag-encode a signed parameter integer (MVT geometry). */
  def zigzag(n: Long): Long = (n << 1) ^ (n >> 63)
  def unzigzag(z: Long): Long = (z >>> 1) ^ -(z & 1)

  private def putKey(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    putVarint(out, (field.toLong << 3) | wire)

  private def putLenDelim(out: ByteArrayOutputStream, field: Int,
                          body: Array[Byte]): Unit = {
    putKey(out, field, 2)
    putVarint(out, body.length.toLong)
    out.write(body)
  }

  private def putVarintField(out: ByteArrayOutputStream, field: Int,
                             value: Long): Unit = {
    putKey(out, field, 0)
    putVarint(out, value)
  }

  private def packed(values: Seq[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    values.foreach(putVarint(out, _))
    out.toByteArray
  }

  // ---- tile encoding -------------------------------------------------

  /** One feature: MVT geom type (1=POINT, 2=LINESTRING, 3=POLYGON),
    * geometry parts (points: one single-vertex part each; lines: one
    * part per path; polygons: part 0 = exterior ring, rest = holes,
    * rings WITHOUT the closing repeat vertex) in tile-local quantized
    * coords, plus string props. */
  final case class TileFeature(id: Long, geomType: Int,
                               parts: Seq[Seq[(Long, Long)]],
                               props: Seq[(String, String)])

  /** Point-feature constructor (the original point-only surface). */
  def PointFeature(id: Long, qx: Long, qy: Long,
                   props: Seq[(String, String)]): TileFeature =
    TileFeature(id, 1, Seq(Seq((qx, qy))), props)

  /** Twice the signed area of a ring in tile coords (Y grows DOWN, so
    * the spec's "exterior = positive area" means clockwise on screen).
    * Surveyor's formula over the unclosed vertex list. */
  def signedArea2(ring: Seq[(Long, Long)]): Long =
    ring.indices.map { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.length)
      x1 * y2 - x2 * y1
    }.sum

  /** Encode a feature's geometry as MVT 2.1 command integers: a single
    * cursor runs across ALL parts; MoveTo/LineTo parameters are
    * zigzagged deltas from it. Points: one MoveTo(n). Lines: per path
    * MoveTo(1) + LineTo(n-1). Polygons: per ring MoveTo(1) +
    * LineTo(n-1) + ClosePath, winding NORMALIZED to the spec (exterior
    * ring positive area, holes negative — tippecanoe does the same
    * rather than rejecting) based on ring position. */
  def encodeGeometry(geomType: Int, parts: Seq[Seq[(Long, Long)]]): Seq[Long] = {
    var cx = 0L; var cy = 0L
    val out = Seq.newBuilder[Long]
    def emit(x: Long, y: Long): Unit = {
      out += zigzag(x - cx); out += zigzag(y - cy); cx = x; cy = y
    }
    geomType match {
      case 1 =>
        val pts = parts.flatten
        require(pts.nonEmpty, "point feature needs >= 1 vertex")
        out += (1L | (pts.size.toLong << 3)) // MoveTo(n)
        pts.foreach { case (x, y) => emit(x, y) }
      case 2 =>
        require(parts.nonEmpty && parts.forall(_.size >= 2),
          "each path needs >= 2 vertices")
        parts.foreach { path =>
          out += 9L // MoveTo(1)
          emit(path.head._1, path.head._2)
          out += (2L | ((path.size - 1).toLong << 3)) // LineTo(n-1)
          path.tail.foreach { case (x, y) => emit(x, y) }
        }
      case 3 =>
        require(parts.nonEmpty && parts.forall(_.size >= 3),
          "each ring needs >= 3 vertices")
        parts.zipWithIndex.foreach { case (ring0, i) =>
          val a2 = signedArea2(ring0)
          require(a2 != 0L, s"degenerate zero-area ring $i")
          // exterior (i=0) must read positive, holes negative
          val ring = if ((i == 0) == (a2 > 0L)) ring0 else ring0.reverse
          out += 9L // MoveTo(1)
          emit(ring.head._1, ring.head._2)
          out += (2L | ((ring.size - 1).toLong << 3)) // LineTo(n-1)
          ring.tail.foreach { case (x, y) => emit(x, y) }
          out += 15L // ClosePath(1)
        }
      case other =>
        throw new IllegalArgumentException(s"unknown geom type $other")
    }
    out.result()
  }

  /** Decode MVT command integers back to geometry parts (the inverse of
    * [[encodeGeometry]]): points → one single-vertex part per vertex;
    * lines → one part per MoveTo-started path; polygons → one part per
    * ClosePath-terminated ring (closing vertex not repeated). */
  def decodeGeometry(geomType: Int, geom: Seq[Long]): Seq[Seq[(Long, Long)]] = {
    var i = 0; var cx = 0L; var cy = 0L
    val parts = Seq.newBuilder[Seq[(Long, Long)]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def step(): (Long, Long) = {
      cx += unzigzag(geom(i)); cy += unzigzag(geom(i + 1)); i += 2
      (cx, cy)
    }
    while (i < geom.length) {
      val cmd = geom(i); i += 1
      val id = (cmd & 7L).toInt; val count = (cmd >>> 3).toInt
      (id: @unchecked) match {
        case 1 => // MoveTo
          require(count >= 1, "MoveTo count 0")
          (0 until count).foreach { _ =>
            val v = step()
            if (geomType == 1) parts += Seq(v)
            else {
              if (cur.nonEmpty) { parts += cur.toSeq }
              cur = scala.collection.mutable.ArrayBuffer(v)
            }
          }
        case 2 => // LineTo
          require(geomType != 1 && count >= 1, s"bad LineTo in type $geomType")
          (0 until count).foreach(_ => cur += step())
        case 7 => // ClosePath
          require(geomType == 3 && count == 1 && cur.size >= 3,
            s"bad ClosePath in type $geomType")
          parts += cur.toSeq
          cur = scala.collection.mutable.ArrayBuffer.empty
        case other =>
          throw new IllegalArgumentException(s"unknown command $other")
      }
    }
    if (cur.nonEmpty) {
      require(geomType == 2, s"unterminated part in type $geomType")
      parts += cur.toSeq
    }
    parts.result()
  }

  /** Encode one tile: a single layer of features (any mix of geometry
    * types). Keys and values are deduplicated in first-appearance order
    * (feature order is the caller's — the sink sorts by id, so the
    * tables are deterministic). All property values encode as
    * string_value (Value field 1), matching the GeoJSONL sink's
    * MAP<STRING,STRING> props model. */
  def encodeTile(layer: String, extent: Int,
                 features: Seq[TileFeature]): Array[Byte] = {
    val keys = scala.collection.mutable.LinkedHashMap[String, Int]()
    val values = scala.collection.mutable.LinkedHashMap[String, Int]()
    val featureBodies = features.map { f =>
      val fb = new ByteArrayOutputStream()
      putVarintField(fb, 1, f.id)
      val tags = f.props.flatMap { case (k, v) =>
        val ki = keys.getOrElseUpdate(k, keys.size)
        val vi = values.getOrElseUpdate(v, values.size)
        Seq(ki.toLong, vi.toLong)
      }
      putLenDelim(fb, 2, packed(tags))
      putVarintField(fb, 3, f.geomType.toLong)
      putLenDelim(fb, 4, packed(encodeGeometry(f.geomType, f.parts)))
      fb.toByteArray
    }
    val lb = new ByteArrayOutputStream()
    putLenDelim(lb, 1, layer.getBytes("UTF-8"))
    featureBodies.foreach(putLenDelim(lb, 2, _))
    keys.keys.foreach(k => putLenDelim(lb, 3, k.getBytes("UTF-8")))
    values.keys.foreach { v =>
      val vb = new ByteArrayOutputStream()
      putLenDelim(vb, 1, v.getBytes("UTF-8")) // Value.string_value
      putLenDelim(lb, 4, vb.toByteArray)
    }
    putVarintField(lb, 5, extent.toLong)
    putVarintField(lb, 15, 2L) // spec version 2
    val tb = new ByteArrayOutputStream()
    putLenDelim(tb, 3, lb.toByteArray)
    tb.toByteArray
  }

  // ---- tile decoding (conforming, field-order-agnostic) --------------

  final case class DecodedFeature(id: Long, tags: Seq[Int], geomType: Int,
                                  geometry: Seq[Long])
  final case class DecodedLayer(name: String, version: Int, extent: Int,
                                keys: Seq[String], values: Seq[String],
                                features: Seq[DecodedFeature])

  private final class Reader(b: Array[Byte], from: Int, until: Int) {
    var pos: Int = from
    def hasNext: Boolean = pos < until
    def varint(): Long = {
      var shift = 0; var v = 0L
      while ({
        val byte = b(pos) & 0xff; pos += 1
        v |= (byte & 0x7fL) << shift; shift += 7
        (byte & 0x80) != 0
      }) ()
      v
    }
    def lenDelim(): (Int, Int) = { // (from, until) of the body
      val n = varint().toInt
      val r = (pos, pos + n); pos += n; r
    }
  }

  /** Parse a serialized Tile into its layers. Accepts any field order;
    * rejects wire types this sink never writes (corrupt input fails
    * loudly, not as garbage coordinates). */
  def decodeTile(bytes: Array[Byte]): Seq[DecodedLayer] = {
    val r = new Reader(bytes, 0, bytes.length)
    val layers = Seq.newBuilder[DecodedLayer]
    while (r.hasNext) {
      val key = r.varint()
      require((key >> 3) == 3 && (key & 7) == 2, s"unexpected Tile field $key")
      val (f, u) = r.lenDelim()
      layers += decodeLayer(bytes, f, u)
    }
    layers.result()
  }

  private def decodeLayer(b: Array[Byte], from: Int, until: Int): DecodedLayer = {
    val r = new Reader(b, from, until)
    var name = ""; var version = 1; var extent = 4096
    val keys = Seq.newBuilder[String]; val values = Seq.newBuilder[String]
    val features = Seq.newBuilder[DecodedFeature]
    while (r.hasNext) {
      val key = r.varint()
      ((key >> 3).toInt, (key & 7).toInt) match {
        case (1, 2) => val (f, u) = r.lenDelim(); name = new String(b, f, u - f, "UTF-8")
        case (2, 2) => val (f, u) = r.lenDelim(); features += decodeFeature(b, f, u)
        case (3, 2) => val (f, u) = r.lenDelim(); keys += new String(b, f, u - f, "UTF-8")
        case (4, 2) => val (f, u) = r.lenDelim(); values += decodeValue(b, f, u)
        case (5, 0) => extent = r.varint().toInt
        case (15, 0) => version = r.varint().toInt
        case other => throw new IllegalArgumentException(s"unexpected Layer field $other")
      }
    }
    DecodedLayer(name, version, extent, keys.result(), values.result(), features.result())
  }

  private def decodeValue(b: Array[Byte], from: Int, until: Int): String = {
    val r = new Reader(b, from, until)
    val key = r.varint()
    require((key >> 3) == 1 && (key & 7) == 2,
      s"only string_value is written by this sink; got Value field $key")
    val (f, u) = r.lenDelim()
    new String(b, f, u - f, "UTF-8")
  }

  private def decodeFeature(b: Array[Byte], from: Int, until: Int): DecodedFeature = {
    val r = new Reader(b, from, until)
    var id = 0L; var geomType = 0
    var tags = Seq.empty[Int]; var geom = Seq.empty[Long]
    while (r.hasNext) {
      val key = r.varint()
      ((key >> 3).toInt, (key & 7).toInt) match {
        case (1, 0) => id = r.varint()
        case (2, 2) =>
          val (f, u) = r.lenDelim(); val pr = new Reader(b, f, u)
          val t = Seq.newBuilder[Int]
          while (pr.hasNext) t += pr.varint().toInt
          tags = t.result()
        case (3, 0) => geomType = r.varint().toInt
        case (4, 2) =>
          val (f, u) = r.lenDelim(); val pr = new Reader(b, f, u)
          val g = Seq.newBuilder[Long]
          while (pr.hasNext) g += pr.varint()
          geom = g.result()
        case other => throw new IllegalArgumentException(s"unexpected Feature field $other")
      }
    }
    DecodedFeature(id, tags, geomType, geom)
  }

  // ---- Spark sink / source -------------------------------------------

  /** Write one binary `.mvt` file per (z, x, y) under `path/z/x/y.mvt` —
    * the tree layout ram-vt publishes. Same quantization, cap and
    * single shuffle as [[VectorTiles.writePyramid]]; each tile's
    * (cap-bounded) feature list gathers onto one row and encodes
    * executor-side, so the write is distributed — the driver never sees
    * tile bytes. */
  def writeTiles(points: DataFrame, minZ: Int, maxZ: Int, path: String,
                 idCol: String, propCols: Seq[String],
                 layer: String = "graft", maxPerTile: Int = 0,
                 extent: Int = VectorTiles.Extent): Unit = {
    val tf = VectorTiles.tilePyramid(points, minZ, maxZ, extent)
    val capped = VectorTiles.capPerTile(
      tf.repartition(col("z"), col("tile_x"), col("tile_y")), idCol, maxPerTile)
    val packed = capped
      .select(col("z").cast("int").as("z"), col("tile_x"), col("tile_y"),
        struct(col(idCol).cast("long").as("id"), col("qx"), col("qy"),
          array(propCols.map(c =>
            struct(lit(c).as("k"), col(c).cast("string").as("v"))): _*)
            .as("props")).as("f"))
      .groupBy(col("z"), col("tile_x"), col("tile_y"))
      // struct ordering compares id first -> features sort by id
      .agg(sort_array(collect_list(col("f"))).as("fs"))
    packed.foreachPartition { (rows: Iterator[Row]) =>
      rows.foreach { row =>
        val features = row.getSeq[Row](3).map { f =>
          PointFeature(f.getLong(0), f.getLong(1), f.getLong(2),
            f.getSeq[Row](3).map(p => (p.getString(0), p.getString(1))))
        }
        val bytes = encodeTile(layer, extent, features)
        val p = Paths.get(path, row.getInt(0).toString,
          row.getLong(1).toString, s"${row.getLong(2)}.mvt")
        Files.createDirectories(p.getParent)
        Files.write(p, bytes)
      }
    }
  }

  /** Read a `.mvt` tile tree back: one row per feature VERTEX with its
    * (z, x, y), geometry type, part index (line path / polygon ring),
    * vertex index within the part, decoded tile-local coordinates and
    * props. A point feature reads back as exactly one row (part 0,
    * vidx 0), so point-only consumers see the original per-feature
    * granularity. Binary decode rides `mapPartitions` over the
    * binaryFile source — the §4 idiom for opaque bytes, one decoder
    * instance per partition. */
  def readTiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val tilePath = "^.*/(\\d+)/(\\d+)/(\\d+)\\.mvt$".r
    spark.read.format("binaryFile").load(s"$path/*/*/*.mvt")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (p, bytes) =>
        val (z, x, y) = p match {
          case tilePath(z, x, y) => (z.toInt, x.toLong, y.toLong)
          case _ => throw new IllegalArgumentException(s"not a tile path: $p")
        }
        decodeTile(bytes).flatMap { layer =>
          layer.features.flatMap { f =>
            val props = f.tags.grouped(2).map {
              case Seq(ki, vi) => layer.keys(ki) -> layer.values(vi)
            }.toMap
            decodeGeometry(f.geomType, f.geometry).zipWithIndex.flatMap {
              case (part, pi) => part.zipWithIndex.map {
                case ((qx, qy), vi) =>
                  (z, x, y, f.id, f.geomType, pi, vi, qx, qy, props)
              }
            }
          }
        }
      })
      .toDF("z", "tile_x", "tile_y", "id", "geom_type", "part", "vidx",
        "qx", "qy", "props")
  }

  /** Write pre-assembled features (any geometry type) as a binary
    * `.mvt` tree. Input: one row per feature with `z, tile_x, tile_y,
    * id, geom_type, parts` (array of arrays of struct{qx, qy} —
    * tile-local quantized, polygon rings unclosed, exterior first) and
    * `props` (array of struct{k, v}). Quantization and clip-to-tile are
    * the upstream operator's job ([[graft.operators.Accessibility
    * .tileAdminPolygons]] runs Sutherland-Hodgman per tile); this sink
    * only shuffles by tile key, gathers each tile's bounded feature
    * list, and encodes executor-side — the same distribution contract
    * as the point sink. */
  def writeFeatureTiles(features: DataFrame, path: String,
                        layer: String = "graft",
                        extent: Int = VectorTiles.Extent): Unit = {
    val packed = features
      .select(col("z").cast("int").as("z"),
        col("tile_x").cast("long").as("tile_x"),
        col("tile_y").cast("long").as("tile_y"),
        struct(col("id").cast("long").as("id"),
          col("geom_type").cast("int").as("gt"),
          col("parts"), col("props")).as("f"))
      .repartition(col("z"), col("tile_x"), col("tile_y"))
      .groupBy(col("z"), col("tile_x"), col("tile_y"))
      // struct ordering compares id first -> features sort by id
      .agg(sort_array(collect_list(col("f"))).as("fs"))
    packed.foreachPartition { (rows: Iterator[Row]) =>
      rows.foreach { row =>
        val features = row.getSeq[Row](3).map { f =>
          TileFeature(f.getLong(0), f.getInt(1),
            // parts is ARRAY<ARRAY<STRUCT<qx, qy>>>: outer elements are
            // Seq[Row], inner rows are the vertices
            f.getSeq[scala.collection.Seq[Row]](2).map(part =>
              part.map(v => (v.getLong(0), v.getLong(1))).toSeq).toSeq,
            f.getSeq[Row](3).map(p => (p.getString(0), p.getString(1))).toSeq)
        }
        val bytes = encodeTile(layer, extent, features)
        val p = Paths.get(path, row.getInt(0).toString,
          row.getLong(1).toString, s"${row.getLong(2)}.mvt")
        Files.createDirectories(p.getParent)
        Files.write(p, bytes)
      }
    }
  }
}
