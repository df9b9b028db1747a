package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Routing
import graft.sources.{OsmFixture, OsmXml}

class OsmXmlSpec extends AnyFunSuite {
  import TestSession._

  // hand-written extract covering every parser semantic: a 3-node
  // two-way chain, a oneway=yes way, a oneway=-1 way, a maxspeed
  // override, a non-drivable footway, an untagged way, a dangling node
  // ref, a self-loop segment, and a parallel (fast vs slow) edge pair
  private lazy val tiny: String = {
    val xml =
      """<?xml version='1.0' encoding='UTF-8'?>
        |<osm version="0.6" generator="test">
        |  <node id="1" lat="0.0" lon="0.0"/>
        |  <node id="2" lat="0.0" lon="1.0"/>
        |  <node id="3" lat="1.0" lon="1.0"/>
        |  <node id="4" lat="1.0" lon="0.0"/>
        |  <way id="10">
        |    <nd ref="1"/><nd ref="2"/><nd ref="3"/>
        |    <tag k="highway" v="residential"/>
        |  </way>
        |  <way id="11">
        |    <nd ref="3"/><nd ref="4"/>
        |    <tag k="highway" v="primary"/>
        |    <tag k="oneway" v="yes"/>
        |  </way>
        |  <way id="12">
        |    <nd ref="4"/><nd ref="1"/>
        |    <tag k="highway" v="secondary"/>
        |    <tag k="oneway" v="-1"/>
        |  </way>
        |  <way id="13">
        |    <nd ref="1"/><nd ref="3"/>
        |    <tag k="highway" v="service"/>
        |    <tag k="maxspeed" v="80"/>
        |    <tag k="oneway" v="yes"/>
        |  </way>
        |  <way id="14">
        |    <nd ref="1"/><nd ref="3"/>
        |    <tag k="highway" v="living_street"/>
        |    <tag k="oneway" v="yes"/>
        |  </way>
        |  <way id="15">
        |    <nd ref="1"/><nd ref="2"/>
        |    <tag k="highway" v="footway"/>
        |  </way>
        |  <way id="16">
        |    <nd ref="1"/><nd ref="2"/>
        |    <tag k="name" v="no highway tag"/>
        |  </way>
        |  <way id="17">
        |    <nd ref="2"/><nd ref="99"/>
        |    <tag k="highway" v="primary"/>
        |  </way>
        |  <way id="18">
        |    <nd ref="2"/><nd ref="2"/>
        |    <tag k="highway" v="primary"/>
        |  </way>
        |</osm>
        |""".stripMargin
    val p = Files.createTempFile("graft-osm-tiny", ".osm")
    Files.writeString(p, xml)
    p.toFile.deleteOnExit()
    p.toString
  }

  test("nodes and ways parse with explicit schemas") {
    assert(OsmXml.nodes(spark, tiny).count() == 4)
    val w = OsmXml.ways(spark, tiny).collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(w(10) == Seq(1L, 2L, 3L)) // chain order preserved
    assert(w.contains(16))           // untagged way still parses
  }

  test("edge semantics: oneway, chains, drops, override, fastest-wins") {
    val e = OsmXml.roadEdges(spark, tiny)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    // two-way chain 1-2-3 → 4 directed edges at residential 25 km/h
    assert(e.contains((1L, 2L)) && e.contains((2L, 1L)) &&
      e.contains((2L, 3L)) && e.contains((3L, 2L)))
    assert(e((1L, 2L))._1 == 25.0)
    // oneway=yes: 3→4 only
    assert(e.contains((3L, 4L)) && !e.contains((4L, 3L)))
    // oneway=-1: digitized 4→1 reversed to 1→4 only
    assert(e.contains((1L, 4L)) && !e.contains((4L, 1L)))
    // parallel 1→3 (service maxspeed=80 vs living_street 10): the
    // override wins the class speed AND the fastest edge survives
    assert(e((1L, 3L))._1 == 80.0)
    // footway / untagged / dangling-ref / self-loop all dropped
    assert(!e.contains((2L, 99L)) && !e.contains((2L, 2L)))
    val expectW = 1.0 * 111.0 / 80.0 * 3600.0 // dist 1 deg at 80 km/h
    assert(e((1L, 3L))._2 == math.sqrt(2.0) * 111.0 / 80.0 * 3600.0 ||
      e((1L, 3L))._2 == expectW) // diag dist sqrt(2)
  }

  test("fixture round-trips to the formulaic graph with class speeds") {
    val path = OsmFixture.writeRoadFixture(spark, sf)
    val osm = OsmXml.roadEdges(spark, path)
    val syn = Routing.roadEdges(spark, sf)
    // identical (src, dst) edge sets
    assert(osm.select("src", "dst").except(syn.select("src", "dst")).count() == 0)
    assert(syn.select("src", "dst").except(osm.select("src", "dst")).count() == 0)
    // every parsed speed is a class speed or the 40 override, and every
    // ring-only edge (never also a chord) rides primary at 65
    val speeds = osm.select("speed_kmh").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(speeds.subsetOf(Set(65.0, 55.0, 40.0)))
    // weights: dist * 111 / speed * 3600 exactly (one spot edge)
    val r = osm.filter(col("speed_kmh") === 65.0).head()
    assert(r.getDouble(4) == r.getDouble(2) * 111.0 / 65.0 * 3600.0)
  }

  test("osmRouteEta matches the synthetic-graph router shape") {
    val eta = Routing.osmRouteEta(spark, sf)
    val base = Routing.routeEta(spark, sf)
    // same (src, node) reachability (same graph topology); etas differ
    // only via class speeds vs the flat 60 km/h
    assert(eta.select("src", "node").except(base.select("src", "node")).count() == 0)
    assert(base.select("src", "node").except(eta.select("src", "node")).count() == 0)
    assert(eta.filter(col("src") === col("node"))
      .filter(col("eta_s") =!= 0.0).count() == 0)
  }
}
