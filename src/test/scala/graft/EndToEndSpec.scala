package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Accessibility
import graft.sources.{Exports, GeoJson}

/** The reference's full run, end to end on graft: load entities, compute
  * per-origin ETA to the nearest POI of each type, roll up per admin
  * area, and export the three result shapes (GeoJSON features, grouped
  * JSON, flattened CSV) — the complete ram-analysis job
  * (app/index.js:99-135, 519-604) as one Spark pipeline.
  */
class EndToEndSpec extends AnyFunSuite {
  import TestSession._

  private def outDir(name: String): String = {
    val d = new java.io.File(s"target/tmp-e2e/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getParentFile.mkdirs()
    d.getAbsolutePath
  }

  test("full accessibility run: ETA -> rollup -> three export formats") {
    // 1. per-origin, per-poi-type ETA (the OSRM-table + row-min analog)
    val eta = Accessibility.nearestPoi(spark, sf)
    val nOrigins = Tables.customer(spark, sf).count()
    assert(eta.count() == nOrigins * 4)

    // 2. wide per-origin record with eta-<type> properties (jsonToGeojson)
    val wide = eta.groupBy("c_custkey").pivot("poi_type", Seq(0, 1, 2, 3)).sum("eta_s")
      .select(col("c_custkey"), col("0").as("eta-0"), col("1").as("eta-1"),
        col("2").as("eta-2"), col("3").as("eta-3"))
      .withColumn("lat", graft.functions.GeoFunctions.latOf(col("c_custkey")))
      .withColumn("lon", graft.functions.GeoFunctions.lonOf(col("c_custkey")))
      .join(Tables.customer(spark, sf).select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal").as("population")),
        "c_custkey")
    assert(wide.count() == nOrigins)

    // 3. GeoJSON export (generateGeoJSON) and read-back
    val gj = outDir("results_geojsonl")
    GeoJson.writePointsJsonl(wide, "lon", "lat", gj)
    val back = GeoJson.readPoints(spark, gj, featureCollection = false)
    assert(back.count() == nOrigins)
    assert(back.columns.contains("eta-0") && back.columns.contains("population"))

    // 4. grouped JSON per admin area (generateJSON)
    val grouped = Exports.groupedJson(
      wide.withColumnRenamed("c_nationkey", "admin_area"), "admin_area")
    val nAreas = wide.select("c_nationkey").distinct().count()
    assert(grouped.count() == nAreas)

    // 5. flattened CSV (generateCSV) with nested poi struct
    val nested = wide.select(col("c_custkey"),
      struct(col("eta-0").as("school"), col("eta-1").as("hospital")).as("poi"),
      col("population"))
    val csvDir = outDir("results_csv")
    Exports.writeFlatCsv(nested, csvDir)
    val csv = spark.read.option("header", "true").csv(csvDir)
    assert(csv.columns.toSeq == Seq("c_custkey", "poi.school", "poi.hospital", "population"))
    assert(csv.count() == nOrigins)

    // 6. headline stat matches the oracle-checked accessibility query
    val headline = Accessibility.accessibility(spark, sf)
    assert(headline.count() == Tables.nation(spark, sf)
      .join(Tables.customer(spark, sf),
        col("n_nationkey") === col("c_nationkey"), "left_semi").count())
  }

  test("admin areas flow from GeoJSON polygons to per-area origin counts") {
    import spark.implicits._
    // export the same deterministic area rectangles the oracle uses as
    // real polygon features, read them back, and assign origins by
    // ray-cast against the PARSED geometry — source-to-query round trip
    val areas = Tables.nation(spark, sf).select(col("n_name"),
      (col("n_nationkey") * 13 % 150 - 80 + lit(0.05)).as("lat0"),
      (col("n_nationkey") * 29 % 330 - 175 + lit(0.05)).as("lon0"))
      .withColumn("lat1", col("lat0") + 20.0)
      .withColumn("lon1", col("lon0") + 30.0)
      .select(col("n_name").as("name"),
        array(array(
          array(col("lon0"), col("lat0")), array(col("lon1"), col("lat0")),
          array(col("lon1"), col("lat1")), array(col("lon0"), col("lat1")),
          array(col("lon0"), col("lat0")))).as("rings"))
    val path = outDir("areas_geojsonl")
    GeoJson.writePolygonsJsonl(areas, "name", "rings", path, multi = false)
    val loaded = GeoJson.readPolygonsJsonl(spark, path)
      .select(col("name").as("n_name"),
        // outer ring of the (normalized-to-multi) first polygon
        element_at(element_at(col("rings"), 1), 1).as("ring"))
      .select(col("n_name"),
        expr("transform(ring, p -> p[1])").as("plats"),
        expr("transform(ring, p -> p[0])").as("plons"))
    val counts = Tables.customer(spark, sf)
      .withColumn("lat", graft.functions.GeoFunctions.latOf(col("c_custkey")))
      .withColumn("lon", graft.functions.GeoFunctions.lonOf(col("c_custkey")))
      .crossJoin(broadcast(loaded))
      .filter(graft.functions.GeoFunctions.point_in_poly(
        col("lat"), col("lon"), col("plats"), col("plons")))
      .groupBy(col("n_name")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // must equal the oracle-checked areaAssign (same areas, direct arrays)
    val direct = Accessibility.areaAssign(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == direct && counts.nonEmpty)
  }
}
