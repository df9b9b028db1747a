package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GeoFunctions.{latOf, lonOf}
import graft.sources.VectorTiles

class VectorTilesSpec extends AnyFunSuite {
  import TestSession._

  private def outDir(name: String): String = {
    val d = new java.io.File(s"target/tmp-tiles/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getParentFile.mkdirs()
    d.getAbsolutePath
  }

  private def points = Tables.customer(spark, sf)
    .select(col("c_custkey"), latOf(col("c_custkey")).as("lat"),
      lonOf(col("c_custkey")).as("lon"), col("c_nationkey"))

  test("tile tree round-trips with in-range quantized coords, one shard per tile") {
    val dir = outDir("full")
    VectorTiles.writeTiles(points, z = 4, dir, "c_custkey", Seq("c_nationkey"))
    val back = VectorTiles.readTiles(spark, dir)
    assert(back.count() == points.count())
    // every read-back feature carries its tile's z/x/y and a quantized
    // coordinate on the 4096 grid, matching a fresh assignment
    val fresh = VectorTiles.tileFeatures(points, 4)
      .select(col("c_custkey").as("id"), col("tile_x").as("fx"),
        col("tile_y").as("fy"), col("qx").as("fqx"), col("qy").as("fqy"))
    val joined = back.join(fresh, "id")
    assert(joined.count() == points.count())
    assert(joined.filter(col("z") =!= 4 ||
      col("tile_x") =!= col("fx") || col("tile_y") =!= col("fy") ||
      col("qx") =!= col("fqx") || col("qy") =!= col("fqy") ||
      col("qx") < 0 || col("qx") >= VectorTiles.Extent ||
      col("qy") < 0 || col("qy") >= VectorTiles.Extent).isEmpty)
    // props survive the JSON round trip
    assert(back.filter(col("props").getItem("c_nationkey").isNull).isEmpty)
    // one data shard per (z, x, y) directory
    val tileDirs = new java.io.File(dir, "z=4").listFiles()
      .flatMap(_.listFiles()).filter(_.isDirectory)
    assert(tileDirs.nonEmpty)
    tileDirs.foreach { td =>
      val shards = td.listFiles().filter(_.getName.startsWith("part-"))
      assert(shards.length == 1, s"${td} has ${shards.length} shards")
    }
  }

  test("per-tile cap bounds features deterministically") {
    val dirA = outDir("capA"); val dirB = outDir("capB")
    // z=1: 150 points over <=8 tiles, so the 5-feature cap must bind
    VectorTiles.writeTiles(points, 1, dirA, "c_custkey", Seq("c_nationkey"),
      maxPerTile = 5)
    VectorTiles.writeTiles(points, 1, dirB, "c_custkey", Seq("c_nationkey"),
      maxPerTile = 5)
    val a = VectorTiles.readTiles(spark, dirA)
    val counts = a.groupBy(col("tile_x"), col("tile_y")).count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(2) <= 5))
    // the kept subset is a stable function of the data, not of the run
    val idsA = a.select("id").collect().map(_.getLong(0)).toSet
    val idsB = VectorTiles.readTiles(spark, dirB)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(idsA == idsB && idsA.size < points.count())
  }

  test("pyramid: every feature at every zoom, children nest under parents") {
    val minZ = 2; val maxZ = 5
    val py = VectorTiles.tilePyramid(points, minZ, maxZ).cache()
    try {
      // each point appears exactly once per zoom level
      assert(py.count() == points.count() * (maxZ - minZ + 1))
      assert(py.groupBy(col("z")).count()
        .filter(col("count") =!= points.count()).isEmpty)
      // a feature's tile at z+1 must lie inside its tile at z (x/2, y/2)
      val parent = py.filter(col("z") < maxZ)
        .select(col("c_custkey"), (col("z") + 1).as("z"),
          col("tile_x").as("px"), col("tile_y").as("py_"))
      val mismatch = py.join(parent, Seq("c_custkey", "z"))
        .filter(floor(col("tile_x") / 2) =!= col("px") ||
          floor(col("tile_y") / 2) =!= col("py_"))
      assert(mismatch.isEmpty)
      // single zoom level of the pyramid equals the direct assignment
      val solo = VectorTiles.tileFeatures(points, 4)
        .select(col("c_custkey"), col("tile_x"), col("tile_y"),
          col("qx"), col("qy"))
      val lvl = py.filter(col("z") === 4)
        .select(col("c_custkey"), col("tile_x"), col("tile_y"),
          col("qx"), col("qy"))
      assert(lvl.exceptAll(solo).isEmpty && solo.exceptAll(lvl).isEmpty)
    } finally { py.unpersist() }
  }

  test("pyramid write: all zoom dirs present, capped per zoom, round-trips") {
    val dir = outDir("pyr")
    VectorTiles.writePyramid(points, 1, 3, dir, "c_custkey",
      Seq("c_nationkey"), maxPerTile = 10)
    val back = VectorTiles.readTiles(spark, dir).cache()
    try {
      assert((1 to 3).forall(z => new java.io.File(dir, s"z=$z").isDirectory))
      val over = back.groupBy(col("z"), col("tile_x"), col("tile_y"))
        .count().filter(col("count") > 10)
      assert(over.isEmpty)
      // the cap binds at z=1 (<=8 tiles for 150 points) but the higher
      // zoom keeps strictly more features — drop-features, not drop-zoom
      val perZ = back.groupBy(col("z")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(perZ(1) < perZ(3))
    } finally { back.unpersist() }
  }

  test("MVT wire format matches a hand-assembled protobuf fixture") {
    import graft.sources.Mvt
    val got = Mvt.encodeTile("test", 4096,
      Seq(Mvt.PointFeature(7, 25, 17, Seq("name" -> "a"))))
    // assembled by hand from the MVT 2.1 spec: Tile.layer(3) >
    // {name(1)="test", feature(2)={id(1)=7, tags(2)=[0,0],
    // type(3)=POINT, geom(4)=[MoveTo|1, zz(25), zz(17)]},
    // keys(3)=["name"], values(4)=[string "a"], extent(5)=4096,
    // version(15)=2}
    val expect = Array(
      0x1a, 0x25, // Tile.layers, len 37
      0x0a, 0x04, 't', 'e', 's', 't', // name
      0x12, 0x0d, // feature, len 13
      0x08, 0x07, // id = 7
      0x12, 0x02, 0x00, 0x00, // tags [0, 0]
      0x18, 0x01, // type POINT
      0x22, 0x03, 0x09, 0x32, 0x22, // geom [9, zz(25)=50, zz(17)=34]
      0x1a, 0x04, 'n', 'a', 'm', 'e', // keys[0]
      0x22, 0x03, 0x0a, 0x01, 'a', // values[0] = string_value "a"
      0x28, 0x80, 0x20, // extent 4096
      0x78, 0x02 // version 2
    ).map(_.toByte)
    assert(got.sameElements(expect),
      s"got ${got.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    // and the conforming decoder reads it back
    val Seq(layer) = Mvt.decodeTile(got)
    assert(layer.name == "test" && layer.version == 2 && layer.extent == 4096)
    assert(layer.keys == Seq("name") && layer.values == Seq("a"))
    val Seq(f) = layer.features
    assert(f.id == 7 && f.geomType == 1 && f.tags == Seq(0, 0))
    assert(f.geometry == Seq(9L, 50L, 34L))
  }

  test("MVT keys/values tables deduplicate; zigzag round-trips") {
    import graft.sources.Mvt
    val fs = Seq(
      Mvt.PointFeature(1, 0, 4095, Seq("a" -> "x", "b" -> "x")),
      Mvt.PointFeature(2, 4095, 0, Seq("a" -> "y", "b" -> "x")))
    val Seq(layer) = Mvt.decodeTile(Mvt.encodeTile("l", 4096, fs))
    assert(layer.keys == Seq("a", "b"), "keys dedup in first-appearance order")
    assert(layer.values == Seq("x", "y"), "values dedup across features")
    // feature 2's tags point at the shared entries
    assert(layer.features(1).tags == Seq(0, 1, 1, 0))
    // extreme grid corners survive zigzag
    assert(Mvt.unzigzag(layer.features.head.geometry(2)) == 4095L)
    assert(Mvt.unzigzag(layer.features(1).geometry(1)) == 4095L)
    (Seq(0L, 1L, 17L, 4095L)).foreach(n =>
      assert(Mvt.unzigzag(Mvt.zigzag(n)) == n))
  }

  test("MVT linestring geometry matches the spec's command-integer example") {
    import graft.sources.Mvt
    // the MVT 2.1 spec's own LineString example: MoveTo(2,2),
    // LineTo(2,10), LineTo(10,10) -> [9 4 4 18 0 16 16 0]
    val path = Seq((2L, 2L), (2L, 10L), (10L, 10L))
    val got = Mvt.encodeGeometry(2, Seq(path))
    assert(got == Seq(9L, 4L, 4L, 18L, 0L, 16L, 16L, 0L))
    assert(Mvt.decodeGeometry(2, got) == Seq(path))
    // MULTI-line: the cursor carries across paths (second MoveTo is a
    // delta from the first path's END, spec example 4.3.5.3)
    val multi = Seq(path, Seq((1L, 1L), (3L, 5L)))
    val round = Mvt.decodeGeometry(2, Mvt.encodeGeometry(2, multi))
    assert(round == multi)
  }

  test("MVT polygon geometry: spec example bytes, rings, winding, holes") {
    import graft.sources.Mvt
    // the spec's Polygon example: MoveTo(3,6), LineTo(8,12),
    // LineTo(20,34), ClosePath -> [9 6 12 18 10 12 24 44 15]
    val ring = Seq((3L, 6L), (8L, 12L), (20L, 34L))
    assert(Mvt.signedArea2(ring) > 0, "fixture ring must read exterior")
    val got = Mvt.encodeGeometry(3, Seq(ring))
    assert(got == Seq(9L, 6L, 12L, 18L, 10L, 12L, 24L, 44L, 15L))
    assert(Mvt.decodeGeometry(3, got) == Seq(ring))
    // winding NORMALIZATION: a reversed (negative-area) exterior ring
    // encodes as the spec-wound ring, not as invalid output
    val fixed = Mvt.decodeGeometry(3, Mvt.encodeGeometry(3, Seq(ring.reverse)))
    assert(Mvt.signedArea2(fixed.head) > 0, "exterior must normalize positive")
    // polygon with a hole: exterior positive, hole negative, both
    // round-trip as distinct rings with the cursor running across them
    val ext = Seq((0L, 0L), (0L, 100L), (100L, 100L), (100L, 0L))
      .reverse // make shoelace positive under y-down
    val hole = Seq((20L, 20L), (20L, 40L), (40L, 40L), (40L, 20L))
    val parts = Seq(
      if (Mvt.signedArea2(ext) > 0) ext else ext.reverse,
      if (Mvt.signedArea2(hole) < 0) hole else hole.reverse)
    val back = Mvt.decodeGeometry(3, Mvt.encodeGeometry(3, parts))
    assert(back == parts)
    assert(Mvt.signedArea2(back.head) > 0 && Mvt.signedArea2(back(1)) < 0)
  }

  test("MVT multipoint and full-tile round-trip across all three types") {
    import graft.sources.Mvt
    // multipoint: one MoveTo(n) run, each vertex its own part
    val pts = Seq(Seq((5L, 7L)), Seq((3L, 2L)))
    assert(Mvt.decodeGeometry(1, Mvt.encodeGeometry(1, pts)) == pts)
    // one tile holding a point, a line and a polygon feature decodes
    // back type-faithfully through the full Layer wire format
    val fs = Seq(
      Mvt.TileFeature(1, 1, Seq(Seq((10L, 11L))), Seq("t" -> "pt")),
      Mvt.TileFeature(2, 2, Seq(Seq((0L, 0L), (5L, 5L), (5L, 9L))),
        Seq("t" -> "ln")),
      Mvt.TileFeature(3, 3, Seq(Seq((3L, 6L), (8L, 12L), (20L, 34L))),
        Seq("t" -> "pg")))
    val Seq(layer) = Mvt.decodeTile(Mvt.encodeTile("mixed", 4096, fs))
    assert(layer.features.map(_.geomType) == Seq(1, 2, 3))
    val geoms = layer.features.map(f => Mvt.decodeGeometry(f.geomType, f.geometry))
    assert(geoms(0) == fs(0).parts && geoms(1) == fs(1).parts &&
      geoms(2) == fs(2).parts)
    assert(layer.keys == Seq("t") && layer.values == Seq("pt", "ln", "pg"))
  }

  test("MVT feature sink: polygon/line tiles write and read back exactly") {
    import graft.sources.Mvt
    import spark.implicits._
    val dir = outDir("mvtgeom")
    // two tiles: one polygon (admin-bounds shape), one 3-vertex road line
    val rows = Seq(
      (4, 3L, 5L, 100L, 3, Seq(Seq((0L, 0L), (0L, 50L), (60L, 50L), (60L, 0L))),
        Seq(("kind", "admin"))),
      (4, 3L, 6L, 200L, 2, Seq(Seq((1L, 2L), (9L, 2L), (9L, 30L))),
        Seq(("kind", "road"))))
    val df = rows.toDF("z", "tile_x", "tile_y", "id", "geom_type",
      "parts_raw", "props_raw")
      .select(col("z"), col("tile_x"), col("tile_y"), col("id"),
        col("geom_type"),
        transform(col("parts_raw"), part => transform(part, v =>
          struct(v.getField("_1").as("qx"), v.getField("_2").as("qy"))))
          .as("parts"),
        transform(col("props_raw"), p =>
          struct(p.getField("_1").as("k"), p.getField("_2").as("v")))
          .as("props"))
    Mvt.writeFeatureTiles(df, dir, layer = "geoms")
    val back = graft.sources.Mvt.readTiles(spark, dir)
      .orderBy(col("id"), col("part"), col("vidx")).collect()
    // polygon: 4 vertices (winding-normalized ring content preserved as
    // a set), line: 3 vertices in order
    val poly = back.filter(_.getLong(3) == 100L)
    assert(poly.forall(_.getInt(4) == 3) && poly.length == 4)
    assert(poly.map(r => (r.getLong(7), r.getLong(8))).toSet ==
      Set((0L, 0L), (0L, 50L), (60L, 50L), (60L, 0L)))
    val road = back.filter(_.getLong(3) == 200L)
    assert(road.forall(_.getInt(4) == 2))
    assert(road.map(r => (r.getLong(7), r.getLong(8))).toSeq ==
      Seq((1L, 2L), (9L, 2L), (9L, 30L)))
    assert(back.forall(_.getMap[String, String](9)("kind") != null))
  }

  test("admin-bounds polygons tile through the binary MVT sink end-to-end") {
    import graft.sources.Mvt
    import graft.operators.Accessibility
    val dir = outDir("mvtadmin")
    // geo_tile_admin's quantized per-tile clips are rectangles; rebuild
    // the ring from the bbox (y-down: (qx0,qy0) top-left) and push the
    // admin-bounds layer through the binary wire format — the ram-vt
    // admin-bounds VT_TYPE path
    val clips = Accessibility.tileAdminPolygons(spark, sf)
      .filter(col("q_area2") > 0)
    val feats = clips.select(col("z"), col("tile_x"), col("tile_y"),
      col("n_nationkey").cast("long").as("id"), lit(3).as("geom_type"),
      array(array(
        struct(col("qx0").as("qx"), col("qy0").as("qy")),
        struct(col("qx1").as("qx"), col("qy0").as("qy")),
        struct(col("qx1").as("qx"), col("qy1").as("qy")),
        struct(col("qx0").as("qx"), col("qy1").as("qy")))).as("parts"),
      array(struct(lit("kind").as("k"), lit("admin").as("v"))).as("props"))
    Mvt.writeFeatureTiles(feats, dir, layer = "admin-bounds")
    val back = Mvt.readTiles(spark, dir)
    // every (nation, tile) feature survives with 4 polygon vertices
    // whose bbox equals the registered query's quantized bbox
    val agg = back.groupBy(col("z"), col("tile_x"), col("tile_y"), col("id"))
      .agg(count(lit(1)).as("nv"), min(col("geom_type")).as("gt"),
        min(col("qx")).as("bx0"), min(col("qy")).as("by0"),
        max(col("qx")).as("bx1"), max(col("qy")).as("by1"))
    val joined = clips.join(agg,
      clips("z") === agg("z") && clips("tile_x") === agg("tile_x") &&
        clips("tile_y") === agg("tile_y") &&
        clips("n_nationkey") === agg("id"))
    assert(joined.count() == clips.count())
    assert(joined.filter(col("nv") =!= 4 || col("gt") =!= 3 ||
      col("bx0") =!= col("qx0") || col("by0") =!= col("qy0") ||
      col("bx1") =!= col("qx1") || col("by1") =!= col("qy1")).isEmpty)
    // decoded rings carry spec winding: exterior positive area (y-down)
    val ringsOk = back.collect().groupBy(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .values.forall { vs =>
        val ring = vs.sortBy(_.getInt(6)).map(r => (r.getLong(7), r.getLong(8))).toSeq
        Mvt.signedArea2(ring) > 0
      }
    assert(ringsOk, "decoded exterior rings must read positive area")
  }

  test("road segments tile through the binary MVT sink; clips stay on the segment") {
    import graft.sources.Mvt
    import graft.operators.{Accessibility, Routing}
    val dir = outDir("mvtroads")
    val clips = Accessibility.tileRoadSegments(spark, sf)
      .filter(col("qax") =!= col("qbx") || col("qay") =!= col("qby"))
      .cache()
    try {
      assert(clips.count() > 0)
      // clip invariants: quantized endpoints within the extent grid,
      // and every (edge, tile) row's tile really intersects the edge
      // bbox (candidate generation is sound)
      assert(clips.filter(col("qax") < 0 || col("qax") > 4096 ||
        col("qay") < 0 || col("qay") > 4096 ||
        col("qbx") < 0 || col("qbx") > 4096 ||
        col("qby") < 0 || col("qby") > 4096).isEmpty,
        "quantized clip endpoints must stay on the tile grid")
      // length conservation: summed clipped quantized length per edge
      // approximates the edge's whole in-bounds run — every tile's
      // piece belongs to the same line (no tile invents geometry).
      // Verify a sample of edges end-to-end through the BINARY sink.
      val feats = clips.select(col("z"), col("tile_x"), col("tile_y"),
        (col("src") * 100000L + col("dst")).as("id"),
        lit(2).as("geom_type"),
        array(array(
          struct(col("qax").as("qx"), col("qay").as("qy")),
          struct(col("qbx").as("qx"), col("qby").as("qy")))).as("parts"),
        array(struct(lit("kind").as("k"), lit("road").as("v"))).as("props"))
      Mvt.writeFeatureTiles(feats, dir, layer = "road-network")
      val back = Mvt.readTiles(spark, dir)
      assert(back.count() == 2 * clips.count(), "2 vertices per segment")
      assert(back.filter(col("geom_type") =!= 2).isEmpty)
      // vertex-exact round trip
      val backSeg = back.groupBy(col("z"), col("tile_x"), col("tile_y"),
        col("id"))
        .agg(min(when(col("vidx") === 0, col("qx"))).as("rax"),
          min(when(col("vidx") === 0, col("qy"))).as("ray"),
          min(when(col("vidx") === 1, col("qx"))).as("rbx"),
          min(when(col("vidx") === 1, col("qy"))).as("rby"))
      val joined = clips.withColumn("id", col("src") * 100000L + col("dst"))
        .join(backSeg, Seq("z", "tile_x", "tile_y", "id"))
      assert(joined.count() == clips.count())
      assert(joined.filter(col("rax") =!= col("qax") ||
        col("ray") =!= col("qay") || col("rbx") =!= col("qbx") ||
        col("rby") =!= col("qby")).isEmpty,
        "decoded segment endpoints must equal the clip output exactly")
    } finally { clips.unpersist() }
  }

  test("MVT tile tree: binary write/read round-trips the exact quantization") {
    import graft.sources.Mvt
    val dir = outDir("mvt")
    Mvt.writeTiles(points, 4, 4, dir, "c_custkey", Seq("c_nationkey"))
    val back = Mvt.readTiles(spark, dir).cache()
    try {
      assert(back.count() == points.count())
      // byte-level geometry equals a fresh floor-exact assignment
      val fresh = VectorTiles.tileFeatures(points, 4)
        .select(col("c_custkey").as("id"), col("tile_x").as("fx"),
          col("tile_y").as("fy"), col("qx").as("fqx"), col("qy").as("fqy"),
          col("c_nationkey").cast("string").as("fprop"))
      val joined = back.join(fresh, "id")
      assert(joined.count() == points.count())
      assert(joined.filter(col("z") =!= 4 ||
        col("tile_x") =!= col("fx") || col("tile_y") =!= col("fy") ||
        col("qx") =!= col("fqx") || col("qy") =!= col("fqy") ||
        col("props").getItem("c_nationkey") =!= col("fprop")).isEmpty)
      // the tree layout is path/z/x/y.mvt
      val zDir = new java.io.File(dir, "4")
      assert(zDir.isDirectory)
      val tiles = zDir.listFiles().flatMap(_.listFiles())
      assert(tiles.nonEmpty && tiles.forall(_.getName.endsWith(".mvt")))
    } finally { back.unpersist() }
  }

  test("MVT pyramid write respects the per-tile cap") {
    import graft.sources.Mvt
    val dir = outDir("mvtcap")
    Mvt.writeTiles(points, 1, 3, dir, "c_custkey", Seq("c_nationkey"),
      maxPerTile = 5)
    val back = Mvt.readTiles(spark, dir)
    val over = back.groupBy(col("z"), col("tile_x"), col("tile_y"))
      .count().filter(col("count") > 5)
    assert(over.isEmpty)
    // capped GeoJSONL and capped MVT keep the SAME deterministic subset
    val dirG = outDir("mvtcapG")
    VectorTiles.writePyramid(points, 1, 3, dirG, "c_custkey",
      Seq("c_nationkey"), maxPerTile = 5)
    val g = VectorTiles.readTiles(spark, dirG)
      .select(col("z"), col("tile_x"), col("tile_y"), col("id"))
    val m = back.select(col("z"), col("tile_x"), col("tile_y"), col("id"))
    assert(m.exceptAll(g).isEmpty && g.exceptAll(m).isEmpty)
  }
}
