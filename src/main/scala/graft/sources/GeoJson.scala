package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GeoJSON source/sink.
  *
  * The reference consumes FeatureCollection files (admin areas, origins,
  * POIs) and exports results as FeatureCollections with `eta-<poiType>`
  * properties (ram-analysis/app/index.js:519-604). At 100 TB a single
  * FeatureCollection document is the wrong shape, so the scale path here
  * is newline-delimited features (GeoJSONL, what tippecanoe/ram-vt style
  * tilers ingest): each line parses/serializes independently, so reads
  * split by line and writes stay fully distributed. The classic
  * FeatureCollection form is supported for compatibility — multiLine read
  * for input, and a streamed single-file assembly for export.
  */
object GeoJson {

  /** Read point features into columns (lon, lat, prop columns).
    * Accepts either a FeatureCollection document or GeoJSONL. */
  def readPoints(spark: SparkSession, path: String,
                 featureCollection: Boolean = true): DataFrame = {
    val feats =
      if (featureCollection)
        spark.read.option("multiLine", "true").json(path)
          .select(explode(col("features")).as("f"))
      else
        spark.read.json(path).select(struct(col("*")).as("f"))
    val base = feats.select(
      col("f.geometry.type").as("geom_type"),
      element_at(col("f.geometry.coordinates"), 1).as("lon"),
      element_at(col("f.geometry.coordinates"), 2).as("lat"),
      col("f.properties.*"))
    base.filter(col("geom_type") === "Point").drop("geom_type")
  }

  private def featureJson(lonCol: Column, latCol: Column,
                          props: Seq[(String, Column)]): Column =
    to_json(struct(
      lit("Feature").as("type"),
      struct(lit("Point").as("type"),
        array(lonCol, latCol).as("coordinates")).as("geometry"),
      struct(props.map { case (n, c) => c.as(n) }: _*).as("properties")))

  /** Distributed sink: one feature per line (GeoJSONL). */
  def writePointsJsonl(df: DataFrame, lonCol: String, latCol: String,
                       path: String): Unit = {
    val props = df.columns.filterNot(c => c == lonCol || c == latCol)
      .map(c => c -> df(c)).toSeq
    df.select(featureJson(df(lonCol), df(latCol), props).as("value"))
      .write.mode("overwrite").text(path)
  }

  import org.apache.spark.sql.types._

  /** MultiPolygon coordinates: polygons -> rings -> points -> [lon, lat]. */
  private val MultiPolyType: DataType =
    ArrayType(ArrayType(ArrayType(ArrayType(DoubleType))))
  private val PolyType: DataType = ArrayType(ArrayType(ArrayType(DoubleType)))

  /** Read polygon features (admin areas), normalizing Polygon and
    * MultiPolygon to one MultiPolygon-shaped `rings` column — the
    * reference's array-depth geometry-type inference
    * (ram-analysis/app/index.js:296-306) expressed as a from_json parse
    * cascade: try MultiPolygon depth, fall back to Polygon depth and
    * wrap. Reads GeoJSONL (one feature per line); parse failures of one
    * line never poison the read. */
  def readPolygonsJsonl(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.text(path).select(col("value").as("j"))
    val coords = get_json_object(col("j"), "$.geometry.coordinates")
    val asMulti = from_json(coords, MultiPolyType)
    val asPoly = from_json(coords, PolyType)
    raw.select(
        get_json_object(col("j"), "$.properties.name").as("name"),
        get_json_object(col("j"), "$.geometry.type").as("declared_type"),
        when(asMulti.isNotNull, asMulti)
          .otherwise(array(asPoly)).as("rings"),
        when(asMulti.isNotNull, lit("MultiPolygon"))
          .otherwise(when(asPoly.isNotNull, lit("Polygon"))).as("inferred_type"))
      .filter(col("rings").isNotNull && col("inferred_type").isNotNull)
  }

  /** Distributed polygon sink (GeoJSONL): `rings` must be
    * MultiPolygon-shaped; single-polygon rows pass `multi = false` shape
    * through [[readPolygonsJsonl]] unchanged. */
  def writePolygonsJsonl(df: DataFrame, nameCol: String, ringsCol: String,
                         path: String, multi: Boolean = true): Unit = {
    val geom =
      if (multi) struct(lit("MultiPolygon").as("type"), col(ringsCol).as("coordinates"))
      else struct(lit("Polygon").as("type"), col(ringsCol).as("coordinates"))
    df.select(to_json(struct(
        lit("Feature").as("type"), geom.as("geometry"),
        struct(col(nameCol).as("name")).as("properties"))).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** Compatibility sink: a single FeatureCollection document, streamed
    * feature-by-feature through the driver (no full collect; use only for
    * final, human-sized exports — the scale path is [[writePointsJsonl]]). */
  def writeFeatureCollection(df: DataFrame, lonCol: String, latCol: String,
                             file: String): Unit = {
    val props = df.columns.filterNot(c => c == lonCol || c == latCol)
      .map(c => c -> df(c)).toSeq
    val it = df.select(featureJson(df(lonCol), df(latCol), props).as("value"))
      .toLocalIterator()
    val out = new java.io.PrintWriter(new java.io.BufferedWriter(
      new java.io.FileWriter(file)))
    try {
      out.print("""{"type":"FeatureCollection","features":[""")
      var first = true
      while (it.hasNext) {
        if (!first) out.print(",")
        out.print(it.next().getString(0))
        first = false
      }
      out.print("]}")
    } finally out.close()
  }
}
