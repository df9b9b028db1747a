package graft.sources

import java.nio.file.{Files, Paths, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic OSM XML fixture standing in for the reference's
  * user-uploaded `road-network.osm` (ram-analysis/app/index.js:57 — the
  * file arrives from the project DB, i.e. OUTSIDE the pipeline; there is
  * no extract in the test corpus, so the fixture plays that role).
  *
  * It encodes exactly the formulaic road graph [[graft.operators.Routing
  * .roadEdges]] synthesizes — nodes 0..V-1 at the key-derived
  * coordinates, a one-way ring plus two one-way chord families — but as
  * honest OSM: the ring is ONE `<way>` with a V+1-long `<nd>` chain
  * (exercising the multi-segment path), chords are two-ref ways, speeds
  * come from `highway=` classes and one `maxspeed=` override rather than
  * a constant. Parsing it back through [[OsmXml.roadEdges]] must
  * reproduce the graph edge-for-edge with class speeds — which the
  * `geo_osm_route_eta` oracle pins end to end.
  *
  * Coordinates are printed with `Double.toString` (shortest round-trip
  * form), so XML → parse → double is bit-exact against the oracle's own
  * formula arithmetic.
  *
  * This writer is FIXTURE PLUMBING, not an operator: it generates the
  * input a real deployment already has. V is the supplier key space
  * (1000 at sf0.1), so the driver-side loop is test-sized by
  * construction; everything that scales — parse, segment explosion,
  * coordinate joins, routing — runs distributed from the written file.
  */
object OsmFixture {
  private def latOf(k: Long): Double = (k * 37L % 1700L) / 10.0 - 85.0
  private def lonOf(k: Long): Double = (k * 91L % 3600L) / 10.0 - 180.0

  /** Ring way: highway=primary (65 km/h). Chord ×7+3: highway=secondary
    * (55). Chord ×13+5: highway=residential with maxspeed=40 — the
    * override path. oneway=yes everywhere (the synthetic graph is
    * directed). */
  def writeRoadFixture(spark: SparkSession, dir: String): String = {
    val row = Tables.supplier(spark, dir)
      .agg((max(col("s_suppkey")) + 1L).as("nv"), count(lit(1)).as("n"))
      .head()
    val nv = row.getLong(0)
    // the fixture (and the RoadGraphSql oracle family) assume the
    // supplier key space is 0..V-1 contiguous — every mod-V destination
    // is then itself a node; fail loudly if a corpus ever breaks that
    require(row.getLong(1) == nv,
      s"supplier keys not contiguous 0..${nv - 1} (count=${row.getLong(1)})")
    val path: Path = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-osm-road-$nv.osm")
    if (Files.exists(path)) return path.toString
    val sb = new StringBuilder
    sb ++= "<?xml version='1.0' encoding='UTF-8'?>\n"
    sb ++= "<osm version=\"0.6\" generator=\"graft-fixture\">\n"
    var k = 0L
    while (k < nv) {
      sb ++= s"""  <node id="$k" lat="${latOf(k)}" lon="${lonOf(k)}"/>""" += '\n'
      k += 1
    }
    // ring: one way, node chain 0,1,…,V-1,0 → segments (s, (s+1)%V)
    sb ++= "  <way id=\"1000000\">\n"
    k = 0L
    while (k < nv) { sb ++= s"""    <nd ref="$k"/>""" += '\n'; k += 1 }
    sb ++= "    <nd ref=\"0\"/>\n"
    sb ++= "    <tag k=\"highway\" v=\"primary\"/>\n"
    sb ++= "    <tag k=\"oneway\" v=\"yes\"/>\n"
    sb ++= "  </way>\n"
    def chord(wayId: Long, src: Long, dst: Long, tags: String): Unit = {
      sb ++= s"""  <way id="$wayId">""" += '\n'
      sb ++= s"""    <nd ref="$src"/>""" += '\n'
      sb ++= s"""    <nd ref="$dst"/>""" += '\n'
      sb ++= tags
      sb ++= "    <tag k=\"oneway\" v=\"yes\"/>\n"
      sb ++= "  </way>\n"
    }
    k = 0L
    while (k < nv) {
      val d1 = (k * 7L + 3L) % nv
      if (d1 != k) chord(2000000L + k, k, d1,
        "    <tag k=\"highway\" v=\"secondary\"/>\n")
      val d2 = (k * 13L + 5L) % nv
      if (d2 != k) chord(3000000L + k, k, d2,
        "    <tag k=\"highway\" v=\"residential\"/>\n" +
          "    <tag k=\"maxspeed\" v=\"40\"/>\n")
      k += 1
    }
    sb ++= "</osm>\n"
    val tmp = Paths.get(path.toString + ".tmp-" + System.nanoTime())
    Files.writeString(tmp, sb.toString)
    try Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    path.toString
  }
}
