package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GeoFunctions.{latOf, lonOf}

/** Vector-tile CONTENT generation — the distributed analog of ram-vt's
  * tippecanoe feed (ram-vt/index.js:31-38 pipes the result GeoJSON into
  * tippecanoe; ram-vt/app/index.js uploads the per-tile output tree).
  * Where [[graft.operators.Accessibility.tileAssign]] stops at tile
  * x/y statistics, this produces what a tile server actually consumes:
  * per (z, x, y), the tile's feature list with tile-local QUANTIZED
  * integer coordinates on the MVT 4096-extent grid, written as one
  * GeoJSONL shard per tile directory.
  *
  * Scale posture: quantization is pure map-side arithmetic; the only
  * shuffle is the repartition by tile key that the one-shard-per-tile
  * layout requires, and the optional per-tile feature cap (tippecanoe's
  * drop-features analog) rides that same hash partitioning — the window
  * rank adds a sort within the already-shuffled partitions, never a
  * second exchange.
  */
object VectorTiles {
  val Extent = 4096

  /** Tile assignment + tile-local quantized coordinates at zoom z for a
    * frame with `lat`/`lon` columns. qx/qy in [0, extent) — floor-exact
    * arithmetic only, so the quantization is oracle-checkable.
    *
    * Tile indices are clamped into [0, n): the valid boundary inputs
    * lon = 180.0 and lat = -90.0 scale to exactly n and would otherwise
    * floor into a phantom tile no server ever requests; they belong on
    * the far edge of the last tile (qx/qy clamped to extent-1). */
  def tileFeatures(points: DataFrame, z: Int, extent: Int = Extent): DataFrame = {
    require(z >= 0 && z <= 30)
    val n = 1 << z
    val sx = (col("lon") + 180.0) / 360.0 * n
    val sy = (lit(90.0) - col("lat")) / 180.0 * n
    def tileIdx(s: Column): Column =
      greatest(lit(0L), least(floor(s).cast("long"), lit((n - 1).toLong)))
    def quant(s: Column, t: Column): Column =
      greatest(lit(0L),
        least(floor((s - t) * extent).cast("long"), lit((extent - 1).toLong)))
    points
      .withColumn("tile_x", tileIdx(sx))
      .withColumn("tile_y", tileIdx(sy))
      .withColumn("qx", quant(sx, col("tile_x")))
      .withColumn("qy", quant(sy, col("tile_y")))
  }

  /** Write one GeoJSONL shard per (z, x, y) tile directory: each line is
    * a feature `{"id":…,"qx":…,"qy":…,"props":{…}}` with tile-local
    * coordinates, lines ordered by feature id within the tile.
    *
    * @param maxPerTile tippecanoe's drop-features analog: keep at most N
    *   features per tile, chosen by a deterministic hash order (so the
    *   kept subset is stable across runs and spatially unbiased), 0 = no
    *   cap. The rank reuses the tile-key hash partitioning the write
    *   needs anyway — capping adds no extra shuffle. */
  def writeTiles(points: DataFrame, z: Int, path: String, idCol: String,
                 propCols: Seq[String], maxPerTile: Int = 0): Unit =
    writePyramid(points, z, z, path, idCol, propCols, maxPerTile)

  /** Shared cap+serialize+write tail of the tile sinks: hash-rank cap
    * per (z, x, y), in-partition sort for ordered shards, one GeoJSONL
    * feature line per row, partitioned text write. One implementation —
    * the tile format cannot fork between the single-zoom and pyramid
    * paths. */
  private def writeTileTree(tf: DataFrame, path: String, idCol: String,
                            propCols: Seq[String], maxPerTile: Int): Unit = {
    val keyed = tf.repartition(col("z"), col("tile_x"), col("tile_y"))
    capPerTile(keyed, idCol, maxPerTile)
      .sortWithinPartitions(col("z"), col("tile_x"), col("tile_y"), col(idCol))
      .select(col("z"), col("tile_x"), col("tile_y"),
        to_json(struct(col(idCol).as("id"), col("qx"), col("qy"),
          struct(propCols.map(col): _*).as("props"))).as("value"))
      .write.mode("overwrite").partitionBy("z", "tile_x", "tile_y").text(path)
  }

  /** The per-tile feature cap shared by the GeoJSONL and MVT sinks
    * (tippecanoe's drop-features analog): keep at most maxPerTile
    * features per (z, x, y), chosen by a deterministic hash order so
    * the kept subset is stable across runs and spatially unbiased;
    * <= 0 = no cap. Expects `keyed` already partitioned by the tile
    * key — the window rank reuses that partitioning, adding a sort but
    * never a second exchange. */
  private[sources] def capPerTile(keyed: DataFrame, idCol: String,
                                  maxPerTile: Int): DataFrame =
    if (maxPerTile <= 0) keyed
    else keyed.withColumn("_rk", row_number().over(
        Window.partitionBy(col("z"), col("tile_x"), col("tile_y"))
          .orderBy(xxhash64(col(idCol), col("z"), col("tile_x"),
            col("tile_y")), col(idCol))))
      .filter(col("_rk") <= maxPerTile).drop("_rk")

  /** The whole zoom pyramid in one pass: every feature fans out to its
    * tile at each zoom in [minZ, maxZ] via a map-side explode — the
    * distributed analog of tippecanoe emitting all zoom levels from one
    * input scan. Cost is linear in the zoom count and rides the single
    * write shuffle; at the low zooms where everything piles into a few
    * tiles, [[writePyramid]]'s per-tile cap is the tippecanoe
    * drop-features analog that keeps those tiles bounded. Same clamped
    * floor-exact arithmetic as [[tileFeatures]], with the tile count n
    * derived per row as pow(2, z) (exact in a double for z <= 30). */
  def tilePyramid(points: DataFrame, minZ: Int, maxZ: Int,
                  extent: Int = Extent): DataFrame = {
    require(minZ >= 0 && maxZ <= 30 && minZ <= maxZ)
    val n = pow(lit(2.0), col("z"))
    val sx = (col("lon") + 180.0) / 360.0 * n
    val sy = (lit(90.0) - col("lat")) / 180.0 * n
    def tileIdx(s: Column): Column =
      greatest(lit(0.0), least(floor(s), n - 1)).cast("long")
    def quant(s: Column, t: Column): Column =
      greatest(lit(0.0),
        least(floor((s - t) * extent), lit((extent - 1).toDouble))).cast("long")
    points
      .withColumn("z", explode(sequence(lit(minZ), lit(maxZ))))
      .withColumn("tile_x", tileIdx(sx))
      .withColumn("tile_y", tileIdx(sy))
      .withColumn("qx", quant(sx, col("tile_x")))
      .withColumn("qy", quant(sy, col("tile_y")))
  }

  /** [[writeTiles]] across a zoom range: one GeoJSONL shard per
    * (z, x, y) directory for the whole pyramid, one input scan, one
    * shuffle, with the per-tile feature cap applied per zoom level. */
  def writePyramid(points: DataFrame, minZ: Int, maxZ: Int, path: String,
                   idCol: String, propCols: Seq[String],
                   maxPerTile: Int = 0): Unit =
    writeTileTree(tilePyramid(points, minZ, maxZ), path, idCol, propCols,
      maxPerTile)

  /** Read a tile tree back: one row per feature with its (z, x, y). */
  def readTiles(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumn("f", from_json(col("value"), org.apache.spark.sql.types.StructType
        .fromDDL("id LONG, qx LONG, qy LONG, props MAP<STRING,STRING>")))
      .select(col("z"), col("tile_x"), col("tile_y"),
        col("f.id").as("id"), col("f.qx").as("qx"), col("f.qy").as("qy"),
        col("f.props").as("props"))

  /** Query surface: origins quantized onto their z=6 tiles — the content
    * rows [[writeTiles]] serializes, exposed relationally (and oracle-
    * checked: floor arithmetic only). */
  def tileFeaturesQuery(spark: SparkSession, dir: String, z: Int = 6): DataFrame = {
    val o = Tables.customer(spark, dir).select(col("c_custkey"),
      latOf(col("c_custkey")).as("lat"), lonOf(col("c_custkey")).as("lon"))
    tileFeatures(o, z)
      .select(col("tile_x"), col("tile_y"), col("c_custkey"),
        col("qx"), col("qy"))
      .orderBy(col("tile_x"), col("tile_y"), col("c_custkey"))
  }

  /** Pyramid rollup query surface: per zoom level, how many tiles are
    * occupied and how far the tile indices reach (oracle-checked —
    * integer-exact clamped floors, tile identity packed into one BIGINT
    * for the distinct count). */
  def tilePyramidQuery(spark: SparkSession, dir: String,
                       minZ: Int = 2, maxZ: Int = 6): DataFrame = {
    val o = Tables.customer(spark, dir).select(col("c_custkey"),
      latOf(col("c_custkey")).as("lat"), lonOf(col("c_custkey")).as("lon"))
    tilePyramid(o, minZ, maxZ)
      .groupBy(col("z"))
      .agg(countDistinct(col("tile_x") * pow(lit(2.0), col("z")).cast("long")
          + col("tile_y")).as("n_tiles"),
        count(lit(1)).as("n_features"),
        max(col("tile_x")).as("max_tile_x"),
        max(col("tile_y")).as("max_tile_y"))
      .orderBy(col("z"))
  }
}
