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
}
