package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** OSM XML road-network ingestion — the reference's actual routing input.
  *
  * The reference pipeline's first real step is converting a user-supplied
  * OSM extract into a routable graph: `ram-analysis/app/index.js:53-60`
  * writes `road-network.osm` + `profile.lua` to disk and shells out to
  * `osm2osrm` (`scripts/osm2osrm.sh` → `osrm-extract -p profile.lua
  * road-network.osm`). The profile is the standard OSRM speed mapping
  * from `highway=` class to km/h; everything the engine needs from that
  * step is the weighted edge frame.
  *
  * Spark-first re-expression: Spark 4 ships a NATIVE XML data source
  * (`spark.read.format("xml").option("rowTag", …)`), so nodes and ways
  * are two declarative scans with EXPLICIT schemas (never inferred —
  * same contract discipline as [[Jsonl]]/[[Orc]]; inference would also
  * force an extra full pass over a planet-scale file). Way segments are
  * built with `zip_with` over adjacent `<nd>` refs INSIDE the row — the
  * node-chain → edge-list step is shuffle-free — and only the two
  * coordinate lookups join (standard equi-joins on node id, the join any
  * engine pays to materialize geometry).
  *
  * Scale posture: the XML source splits a large file into row-tag-aligned
  * partitions, so a planet-sized `.osm` scans in parallel; per-way work
  * is local; the only shuffles are the two ref→coord joins and the final
  * (src, dst) fastest-edge dedup, all partial-agg/AQE-friendly. Nothing
  * touches the driver.
  */
object OsmXml {

  /** highway-class → km/h, the OSRM car-profile defaults (public
    * knowledge; the reference uploads exactly such a `profile.lua`).
    * Classes absent here (footway, cycleway, path, …) are not drivable
    * and their ways are dropped, as osrm-extract does. */
  val HighwaySpeedKmh: Map[String, Double] = Map(
    "motorway" -> 90.0, "motorway_link" -> 45.0,
    "trunk" -> 85.0, "trunk_link" -> 40.0,
    "primary" -> 65.0, "primary_link" -> 30.0,
    "secondary" -> 55.0, "secondary_link" -> 25.0,
    "tertiary" -> 40.0, "tertiary_link" -> 20.0,
    "unclassified" -> 25.0, "residential" -> 25.0,
    "living_street" -> 10.0, "service" -> 15.0)

  private val NodeSchema = StructType(Seq(
    StructField("_id", LongType), StructField("_lat", DoubleType),
    StructField("_lon", DoubleType)))

  private val WaySchema = StructType(Seq(
    StructField("_id", LongType),
    StructField("nd", ArrayType(StructType(Seq(StructField("_ref", LongType))))),
    StructField("tag", ArrayType(StructType(Seq(
      StructField("_k", StringType), StructField("_v", StringType)))))))

  /** `<node id lat lon>` elements → (node_id, lat, lon). */
  def nodes(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "node").schema(NodeSchema)
      .load(path)
      .select(col("_id").as("node_id"), col("_lat").as("lat"),
        col("_lon").as("lon"))

  /** `<way>` elements → (way_id, refs: array<long>, tags: map<k,v>).
    * A `<way>` with one `<nd>` (or none) carries no segment and a way
    * without tags gets an empty map — both normalized here so callers
    * never branch on XML shape. */
  def ways(spark: SparkSession, path: String): DataFrame =
    spark.read.format("xml").option("rowTag", "way").schema(WaySchema)
      .load(path)
      .select(col("_id").as("way_id"),
        coalesce(col("nd._ref"), array()).as("refs"),
        map_from_entries(coalesce(
          expr("transform(tag, t -> struct(t._k, t._v))"),
          array())).as("tags"))

  /** Numeric `maxspeed=` override when present and sane, else the
    * highway-class profile speed (exactly osrm-extract's precedence). */
  private def speedOf(tags: Column): Column = {
    val byClass = element_at(typedLit(HighwaySpeedKmh),
      element_at(tags, "highway"))
    val explicit = element_at(tags, "maxspeed").cast(DoubleType)
    when(explicit.isNotNull && explicit > 0.0, explicit).otherwise(byClass)
  }

  /** The routable edge frame: (src, dst, dist_deg, speed_kmh, w) with
    * `w` = travel seconds over the segment at the way's speed.
    *
    * Semantics (all osrm-extract behaviors): only ways whose
    * `highway=` class is drivable; `oneway=yes|1|true` keeps the
    * digitized direction, `oneway=-1` only the reverse, anything else
    * both; segments referencing a node the file never defines are
    * dropped (the coord join is inner); self-loop segments are dropped;
    * parallel edges between the same node pair collapse to the FASTEST
    * (min travel seconds — the one a router would take). */
  def roadEdges(spark: SparkSession, path: String): DataFrame = {
    val n = nodes(spark, path)
    val w = ways(spark, path)
      .withColumn("speed_kmh", speedOf(col("tags")))
      .filter(col("speed_kmh").isNotNull && size(col("refs")) >= 2)
    // adjacent-ref pairs inside the row: refs[i] -> refs[i+1]
    val segs = w.select(col("speed_kmh"),
        element_at(col("tags"), "oneway").as("oneway"),
        explode(zip_with(
          slice(col("refs"), lit(1), size(col("refs")) - 1),
          slice(col("refs"), lit(2), size(col("refs")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("s"))
      .select(col("speed_kmh"), col("oneway"),
        col("s.a").as("a"), col("s.b").as("b"))
    val directed = segs.select(col("speed_kmh"),
        explode(when(col("oneway").isin("yes", "1", "true"),
            array(struct(col("a").as("src"), col("b").as("dst"))))
          .when(col("oneway") === "-1",
            array(struct(col("b").as("src"), col("a").as("dst"))))
          .otherwise(array(
            struct(col("a").as("src"), col("b").as("dst")),
            struct(col("b").as("src"), col("a").as("dst"))))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("speed_kmh"))
      .filter(col("src") =!= col("dst"))
    val withCoords = directed
      .join(n.select(col("node_id"), col("lat").as("slat"),
        col("lon").as("slon")), col("src") === col("node_id"))
      .drop("node_id")
      .join(n.select(col("node_id"), col("lat").as("dlat"),
        col("lon").as("dlon")), col("dst") === col("node_id"))
      .drop("node_id")
    import graft.functions.GeoFunctions.euclidDeg
    withCoords
      .withColumn("dist_deg",
        euclidDeg(col("slat"), col("slon"), col("dlat"), col("dlon")))
      // same op order as GeoFunctions.travelSeconds, speed as a column
      .withColumn("w",
        col("dist_deg") * 111.0 / col("speed_kmh") * 3600.0)
      // fastest parallel edge wins; keep its dist/speed via struct-min
      .groupBy(col("src"), col("dst"))
      .agg(min(struct(col("w"), col("dist_deg"), col("speed_kmh"))).as("m"))
      .select(col("src"), col("dst"), col("m.dist_deg").as("dist_deg"),
        col("m.speed_kmh").as("speed_kmh"), col("m.w").as("w"))
  }
}
