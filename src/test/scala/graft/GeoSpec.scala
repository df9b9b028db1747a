package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GeoFunctions, GeoMath}
import graft.operators.{Accessibility, GeoJoins}

class GeoSpec extends AnyFunSuite {
  import TestSession._

  test("snap roads: matched = cell-covered, projection is the argmin, t on segment") {
    val rows = Accessibility.snapRoads(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getBoolean(1)) && rows.exists(!_.getBoolean(1)),
      "both matched and off-network points must exist")
    // in-memory recompute of the whole matcher
    def lat(k: Long) = (k * 37 % 1700) / 10.0 - 85.0
    def lon(k: Long) = (k * 91 % 3600) / 10.0 - 180.0
    val nv = Tables.supplier(spark, sf)
      .agg(max(col("s_suppkey"))).head().getLong(0) + 1
    val segs = (0L until nv).map { k =>
      val d = (k + 1) % nv
      (k, d, lon(k), lat(k), lon(d), lat(d))
    }
    def cells(x0: Double, x1: Double, y0: Double, y1: Double) =
      (for {
        cx <- math.floor((math.min(x0, x1) + 180) / 10).toLong to
          math.floor((math.max(x0, x1) + 180) / 10).toLong
        cy <- math.floor((math.min(y0, y1) + 90) / 10).toLong to
          math.floor((math.max(y0, y1) + 90) / 10).toLong
      } yield (cx, cy)).toSet
    val segCells = segs.map(s => s -> cells(s._3, s._5, s._4, s._6))
    rows.foreach { r =>
      val id = r.getLong(0)
      val (px, py) = (lon(id), lat(id))
      val pc = (math.floor((px + 180) / 10).toLong,
        math.floor((py + 90) / 10).toLong)
      val cand = segCells.filter(_._2.contains(pc)).map(_._1)
      assert(r.getBoolean(1) == cand.nonEmpty, s"point $id matched flag")
      if (cand.nonEmpty) {
        val scored = cand.map { case (s, d, ax, ay, bx, by) =>
          val (dx, dy) = (bx - ax, by - ay)
          val t = math.max(0.0, math.min(1.0,
            ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
          val (sx, sy) = (ax + t * dx, ay + t * dy)
          val dist = math.sqrt((px - sx) * (px - sx) + (py - sy) * (py - sy))
          (dist, s, d, t, sx, sy)
        }.minBy(c => (c._1, c._2, c._3))
        assert(r.getLong(2) == scored._2 && r.getLong(3) == scored._3,
          s"point $id best segment")
        assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
        assert(math.abs(r.getDouble(5) - scored._1) < 1e-3)
      }
    }
  }

  test("haversine expression matches known distance (Paris-London)") {
    // 48.8566,2.3522 -> 51.5074,-0.1278 is ~343.6 km
    val d = spark.range(1)
      .select(GeoFunctions.haversine_km(
        lit(48.8566), lit(2.3522), lit(51.5074), lit(-0.1278)).as("d"))
      .head().getDouble(0)
    assert(math.abs(d - 343.6) < 1.0, s"got $d")
    assert(GeoMath.haversineKm(0, 0, 0, 0) == 0.0)
  }

  test("haversine survives codegen over a column path") {
    val df = spark.range(100).select(
      GeoFunctions.haversine_km(
        GeoFunctions.latOf(col("id")), GeoFunctions.lonOf(col("id")),
        lit(0.0), lit(0.0)).as("d"))
    val rows = df.collect()
    assert(rows.length == 100 && rows.forall(r => !r.isNullAt(0) && r.getDouble(0) >= 0))
  }

  test("derived coordinates stay in WGS84 bounds") {
    val r = Accessibility // touch to load
    val df = spark.range(10000).select(
      GeoFunctions.latOf(col("id")).as("lat"), GeoFunctions.lonOf(col("id")).as("lon"))
      .agg(min("lat"), max("lat"), min("lon"), max("lon")).head()
    assert(df.getDouble(0) >= -90 && df.getDouble(1) < 90)
    assert(df.getDouble(2) >= -180 && df.getDouble(3) < 180)
  }

  test("radiusJoin equals brute-force distance filter") {
    val left = spark.range(300).select(col("id"),
      GeoFunctions.latOf(col("id")).as("lat"), GeoFunctions.lonOf(col("id")).as("lon"))
    val right = spark.range(50).select((col("id") * 7).as("rid"),
      GeoFunctions.latOf(col("id") * 7).as("lat"), GeoFunctions.lonOf(col("id") * 7).as("lon"))
    val r = 15.0
    val viaGrid = GeoJoins.radiusJoin(left, right, r)
      .select(col("id"), col("rid")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val brute = left.crossJoin(right.select(col("rid"),
        col("lat").as("rlat"), col("lon").as("rlon")))
      .filter(GeoFunctions.euclidDeg(col("lat"), col("lon"), col("rlat"), col("rlon")) <= r)
      .select(col("id"), col("rid")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(viaGrid == brute, s"grid=${viaGrid.size} brute=${brute.size}")
  }

  test("radiusJoin left_outer keeps unmatched lefts with null right") {
    val left = spark.range(20).select(col("id"),
      lit(0.0).as("lat"), (col("id") * 50.0).as("lon")) // most far from right
    val right = spark.range(1).select(col("id").as("rid"),
      lit(0.0).as("lat"), lit(0.0).as("lon"))
    val out = GeoJoins.radiusJoin(left, right, 5.0, joinType = "left_outer")
    assert(out.count() == 20)
    assert(out.filter(col("rid").isNull).count() == 19)
  }

  test("point_in_poly handles non-convex polygons") {
    import spark.implicits._
    // a "U" shape: (0,0)-(10,0)-(10,10)-(6,10)-(6,4)-(4,4)-(4,10)-(0,10)
    val lats = array(Seq(0, 0, 10, 10, 4, 4, 10, 10).map(v => lit(v.toDouble)): _*)
    val lons = array(Seq(0, 10, 10, 6, 6, 4, 4, 0).map(v => lit(v.toDouble)): _*)
    val pts = Seq(
      (1, 2.0, 2.0, true),   // bottom bar
      (2, 2.0, 5.0, true),   // bottom bar, under the notch
      (3, 7.0, 2.0, true),   // left arm
      (4, 7.0, 8.0, true),   // right arm
      (5, 7.0, 4.5, false),  // inside the notch
      (6, 11.0, 5.0, false), // above the shape
      (7, -1.0, -1.0, false))
      .toDF("id", "lat", "lon", "expect")
    val got = pts.withColumn("in",
      GeoFunctions.point_in_poly(col("lat"), col("lon"), lats, lons))
      .collect()
    got.foreach(r => assert(r.getBoolean(4) == r.getBoolean(3),
      s"point ${r.getInt(0)} expected ${r.getBoolean(3)}"))
  }

  test("nearest POI eta is null only when nothing within reach, never negative") {
    val rows = Accessibility.nearestPoi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.filter(!_.isNullAt(2)).foreach(r => assert(r.getDouble(2) >= 0))
    // every origin appears with all 4 poi types (cross semantics)
    val perOrigin = rows.groupBy(_.getLong(0)).values
    assert(perOrigin.forall(_.length == 4))
  }

  test("point_in_multipoly honors holes and disjoint parts") {
    import spark.implicits._
    // part 1: square [0,10]^2 with hole [4,6]^2; part 2: square [20,30]^2
    val outer = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(0.0, 10.0))
    val hole = Seq(Seq(4.0, 4.0), Seq(6.0, 4.0), Seq(6.0, 6.0), Seq(4.0, 6.0))
    val part2 = Seq(Seq(20.0, 20.0), Seq(30.0, 20.0), Seq(30.0, 30.0), Seq(20.0, 30.0))
    val rings = Seq(Seq(outer, hole), Seq(part2)) // [lon, lat] points
    val pts = Seq(
      (2.0, 2.0, true),   // in part 1, outside hole
      (5.0, 5.0, false),  // inside the hole
      (25.0, 25.0, true), // in part 2
      (15.0, 15.0, false) // between parts
    ).toDF("lat", "lon", "expect")
    val got = pts.withColumn("rings", typedLit(rings))
      .withColumn("in", graft.functions.GeoFunctions.point_in_multipoly(
        col("lat"), col("lon"), col("rings")))
      .collect()
    got.foreach(r => assert(r.getBoolean(4) == r.getBoolean(2),
      s"(${r.getDouble(0)}, ${r.getDouble(1)})"))
  }

  test("knn equals brute-force window ranking") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GeoFunctions._
    val o = Tables.customer(spark, sf)
      .select(col("c_custkey"), latOf(col("c_custkey")).as("lat"),
        lonOf(col("c_custkey")).as("lon"))
    val p = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), latOf(col("s_suppkey")).as("plat"),
        lonOf(col("s_suppkey")).as("plon"))
    val d = euclidDeg(col("lat"), col("lon"), col("plat"), col("plon"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("d"), col("s_suppkey"))
    val brute = o.crossJoin(p).withColumn("d", d)
      .filter(col("d") <= operators.Accessibility.MaxReachDeg)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("c_custkey"), col("rk"), col("s_suppkey"), round(col("d"), 4))
      .collect().map(_.toSeq).toSet
    val got = operators.Accessibility.knnPoi(spark, sf)
      .select(col("c_custkey"), col("rk").cast("int"), col("s_suppkey"),
        col("dist_deg"))
      .collect().map(_.toSeq).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("knn tight-phase exchange is planned once and reused") {
    // knnPoi's tight-phase aggregate feeds both the resolved branch and
    // the unresolved anti-join; the design relies on Spark reusing that
    // shuffle (ReusedExchange) instead of a persist/eager-count cache
    // lifecycle (the r9 driver-bench outlier). If a refactor breaks the
    // subtree identity, the tight phase silently executes twice — pin
    // the reuse in the executed plan.
    val out = operators.Accessibility.knnPoi(spark, sf)
    out.collect() // finalize THIS QueryExecution's adaptive plan
    val finalPlan = out.queryExecution.executedPlan.toString
    assert(finalPlan.contains("ReusedExchange") ||
      finalPlan.contains("ReusedQueryStage"),
      s"tight-phase exchange must be reused, not recomputed:\n$finalPlan")
  }

  test("accessibility covered <= total") {
    Accessibility.accessibility(spark, sf).collect().foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_covered <= n_origins
      assert(r.getDouble(3) <= r.getDouble(4) + 0.01) // covered_pop <= total_pop
    }
  }

  test("tile assignment is within zoom bounds") {
    Accessibility.tileAssign(spark, sf, zoom = 4).collect().foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < 16)
      assert(r.getLong(1) >= 0 && r.getLong(1) < 16)
    }
  }

  private def comOf(rings: Seq[Seq[(Double, Double)]]): Option[(Double, Double)] = {
    import graft.functions.GeoFunctions.poly_center_of_mass
    val ringCols = rings.map(r => array(r.map { case (lon, lat) =>
      array(lit(lon), lit(lat)) }: _*))
    val row = spark.range(1)
      .select(poly_center_of_mass(array(ringCols: _*)).as("c"))
      .select(col("c.com_lat"), col("c.com_lon")).collect().head
    if (row.isNullAt(0)) None else Some((row.getDouble(0), row.getDouble(1)))
  }

  test("centerOfMass: triangle, open and closed rings agree") {
    // triangle (0,0)(6,0)(0,6) -> centroid (2, 2)
    val open = comOf(Seq(Seq((0.0, 0.0), (6.0, 0.0), (0.0, 6.0))))
    val closed = comOf(Seq(Seq((0.0, 0.0), (6.0, 0.0), (0.0, 6.0), (0.0, 0.0))))
    assert(open.contains((2.0, 2.0)) && closed == open)
  }

  test("centerOfMass: hole shifts the centroid away, winding-invariant") {
    val outer = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    // off-center 2x2 hole at [6,8]x[6,8]: A1=100 c1=(5,5), A2=4 c2=(7,7)
    val hole = Seq((6.0, 6.0), (8.0, 6.0), (8.0, 8.0), (6.0, 8.0))
    val expected = (100.0 * 5 - 4.0 * 7) / 96.0 // = 4.9166..
    val got = comOf(Seq(outer, hole)).get
    assert(math.abs(got._1 - expected) < 1e-12 &&
      math.abs(got._2 - expected) < 1e-12)
    // reversed windings (outer CW, hole CW) give the identical point
    assert(comOf(Seq(outer.reverse, hole.reverse)).get == got)
  }

  test("centerOfMass: degenerate zero-area polygon yields null") {
    assert(comOf(Seq(Seq((1.0, 1.0), (2.0, 2.0), (3.0, 3.0)))).isEmpty)
  }

  test("geo_center_of_mass query: centroid sits inside the outer ring, off the hole") {
    Accessibility.centerOfMass(spark, sf).collect().foreach { r =>
      val key = r.getInt(0)
      val lat0 = (key * 13 % 150 - 80).toDouble
      val lon0 = (key * 29 % 330 - 175).toDouble
      val (lat, lon) = (r.getDouble(2), r.getDouble(3))
      assert(lat > lat0 && lat < lat0 + 20 && lon > lon0 && lon < lon0 + 30)
      // the hole sits below/left of center, so the centroid shifts up-right
      assert(lat > lat0 + 10.0 && lon > lon0 + 15.0)
    }
  }

  /** Run clip_ring_rect on one literal ring + window, return the clipped
    * vertex list as (x, y) pairs. */
  private def clip(ring: Seq[(Double, Double)],
                   bounds: (Double, Double, Double, Double)): Seq[(Double, Double)] = {
    val ringCol = array(ring.map { case (x, y) => array(lit(x), lit(y)) }: _*)
    val bCol = array(lit(bounds._1), lit(bounds._2), lit(bounds._3), lit(bounds._4))
    val row = spark.range(1)
      .select(GeoFunctions.clip_ring_rect(ringCol, bCol).as("c"),
        GeoFunctions.ring_area2(GeoFunctions.clip_ring_rect(ringCol, bCol)).as("a2"))
      .head()
    row.getSeq[scala.collection.Seq[Double]](0).map(p => (p(0), p(1))).toSeq
  }

  private def area2(ring: Seq[(Double, Double)],
                    bounds: (Double, Double, Double, Double)): Double = {
    val ringCol = array(ring.map { case (x, y) => array(lit(x), lit(y)) }: _*)
    val bCol = array(lit(bounds._1), lit(bounds._2), lit(bounds._3), lit(bounds._4))
    spark.range(1)
      .select(GeoFunctions.ring_area2(
        GeoFunctions.clip_ring_rect(ringCol, bCol)).as("a2"))
      .head().getDouble(0)
  }

  test("clip_ring_rect: rect subject cases — inside, straddle, outside, grazing") {
    val rect = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    // window contains subject: unchanged
    assert(clip(rect, (-1.0, -1.0, 5.0, 5.0)).toSet == rect.toSet)
    // subject contains window: clip == window
    assert(clip(rect, (1.0, 1.0, 3.0, 3.0)).toSet ==
      Set((1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0)))
    // straddle one corner
    assert(clip(rect, (2.0, 2.0, 6.0, 6.0)).toSet ==
      Set((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0)))
    // fully outside: empty
    assert(clip(rect, (5.0, 5.0, 9.0, 9.0)).isEmpty)
    // grazing contact along an edge: degenerate zero-area ring
    assert(area2(rect, (4.0, 0.0, 8.0, 4.0)) == 0.0)
  }

  test("clip_ring_rect: non-convex L-shape clips to an L (6 vertices, exact area)") {
    // L covers [0,4]x[0,2] union [0,2]x[2,4]; window [1,3]^2 ->
    // clip is [1,3]x[1,2] union [1,2]x[2,3]: area 3, 6 vertices
    val ell = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0),
      (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))
    val out = clip(ell, (1.0, 1.0, 3.0, 3.0))
    assert(out.toSet == Set((1.0, 1.0), (3.0, 1.0), (3.0, 2.0),
      (2.0, 2.0), (2.0, 3.0), (1.0, 3.0)), out)
    assert(area2(ell, (1.0, 1.0, 3.0, 3.0)) == 6.0)
  }

  test("buffered_bbox grows, clamps, and flags overflow only when ALL sides exceed") {
    def bb(lat0: Double, lon0: Double, lat1: Double, lon1: Double, km: Double) =
      spark.range(1).select(GeoFunctions.buffered_bbox(
        lit(lat0), lit(lon0), lit(lat1), lit(lon1), lit(km)).as("b"))
        .select(col("b.lat0"), col("b.lon0"), col("b.lat1"), col("b.lon1"),
          col("b.overflow")).head()
    // 111 km = 1 degree: plain growth, no clamp, no overflow
    val g = bb(0.0, 0.0, 10.0, 10.0, 111.0)
    assert(g.getDouble(0) == -1.0 && g.getDouble(1) == -1.0 &&
      g.getDouble(2) == 11.0 && g.getDouble(3) == 11.0 && !g.getBoolean(4))
    // one side exceeding the world box clamps WITHOUT overflow
    val c = bb(80.0, 0.0, 84.0, 10.0, 555.0) // +5 deg: lat1 89 -> clamp 85
    assert(c.getDouble(2) == 85.0 && !c.getBoolean(4))
    // all four sides exceeded: clamped to the world box + overflow flag
    // (the reference's RangeError('World buffer overflow'), utils.js:52)
    val o = bb(-10.0, -10.0, 10.0, 10.0, 111.0 * 200)
    assert(o.getDouble(0) == -85.0 && o.getDouble(1) == -180.0 &&
      o.getDouble(2) == 85.0 && o.getDouble(3) == 180.0 && o.getBoolean(4))
  }

  test("etaMatrix's buffered-bbox pre-filter is result-preserving") {
    // the unfiltered equivalent, built from the same public frames
    val o = Tables.customer(spark, sf).filter(col("c_nationkey") === 7)
      .select(col("c_custkey"),
        GeoFunctions.latOf(col("c_custkey")).as("lat"),
        GeoFunctions.lonOf(col("c_custkey")).as("lon"))
    val p = Tables.supplier(spark, sf)
      .select(col("s_suppkey"), (col("s_suppkey") % 4).as("poi_type"),
        GeoFunctions.latOf(col("s_suppkey")).as("lat"),
        GeoFunctions.lonOf(col("s_suppkey")).as("lon"))
    val unfiltered = GeoJoins.radiusJoin(o, p, Accessibility.MaxReachDeg,
        broadcastRight = true)
      .select(col("c_custkey"), col("s_suppkey"), col("poi_type"),
        round(GeoFunctions.travelSeconds(col("dist_deg"),
          Accessibility.MaxSpeedKmh), 2).as("eta_s"))
    val wired = Accessibility.etaMatrix(spark, sf)
    assert(wired.exceptAll(unfiltered).isEmpty &&
      unfiltered.exceptAll(wired).isEmpty)
  }

  test("clipArea query: square straddling the hole subtracts exactly the overlap") {
    // per (area, cell): clip_area == outer-cell overlap minus hole-cell
    // overlap, and total over cells reassembles the full area (504 =
    // 30*20 - 12*8) — so hole-straddling cells are exercised and consistent
    val rows = Accessibility.clipArea(spark, sf).collect()
    assert(rows.nonEmpty)
    val byArea = rows.groupBy(_.getInt(0))
    byArea.foreach { case (key, rs) =>
      assert(rs.map(_.getLong(9)).sum == 504L, s"area $key total")
      // every row: 4 outer vertices; hole rows subtract a positive overlap
      assert(rs.forall(_.getLong(3) == 4L))
      assert(rs.forall(r => r.getLong(4) == 0L || r.getLong(4) == 4L))
      // at least one cell in each area straddles the hole (hole 12x8 vs
      // 10-deg cells: it can never sit inside a single cell column band)
      assert(rs.count(_.getLong(4) == 4L) >= 2, s"area $key hole straddle")
    }
    // the bbox columns really are the clip geometry: ox/oy spans bound
    // the cell and the area consistently
    rows.foreach { r =>
      val (cx, cy) = (r.getLong(1), r.getLong(2))
      assert(r.getLong(5) >= cx * 10 && r.getLong(7) <= cx * 10 + 10)
      assert(r.getLong(6) >= cy * 10 && r.getLong(8) <= cy * 10 + 10)
      assert(r.getLong(9) > 0 &&
        r.getLong(9) <= (r.getLong(7) - r.getLong(5)) * (r.getLong(8) - r.getLong(6)))
    }
  }

  test("arealInterp: population conserved per nation, shares proportional to area") {
    import org.apache.spark.sql.functions.col
    val rows = Accessibility.arealInterp(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val popByNation = Tables.customer(spark, sf)
      .groupBy(col("c_nationkey")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (nat, rs) =>
      val pop = popByNation(nat).toDouble
      assert(rs.forall(_._3 == popByNation(nat)), "pop column mismatch")
      // conservation: apportioned cells re-sum to the nation population
      // (each cell rounded to 1e-4, so tolerance scales with cell count)
      assert(math.abs(rs.map(_._4).sum - pop) < rs.length * 1e-4 + 1e-9,
        s"nation $nat not conserved")
      // proportionality: a cell with twice the area gets twice the pop
      val perArea = rs.map(r => r._4 / r._2)
      assert(perArea.max - perArea.min < 1e-3,
        s"nation $nat shares not proportional to area")
    }
  }

  test("hexAssign: total coverage, points actually nearest their hex center") {
    import org.apache.spark.sql.functions.col
    val rows = Accessibility.hexAssign(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum ==
      Tables.customer(spark, sf).count(), "every origin lands in a cell")
    // cube-rounding correctness: each occupied cell's center must be
    // within one hex circumradius (= size) of some origin; spot-check
    // via the max |center - any-origin| over a sampled cell set
    val pts = Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map { r =>
        val k = r.getLong(0)
        val lat = (k * 37 % 1700) / 10.0 - 85.0
        val lon = (k * 91 % 3600) / 10.0 - 180.0
        (lon, lat)
      }
    rows.take(40).foreach { r =>
      val (cx, cy) = (r.getDouble(4), r.getDouble(5))
      val nearest = pts.map { case (x, y) =>
        math.hypot(x - cx, y - cy) }.min
      // circumradius of a size-3 pointy-top hex is 3 degrees
      assert(nearest <= 3.0 + 1e-6,
        s"cell (${r.getLong(0)},${r.getLong(1)}) center has no origin within a hex radius")
    }
  }

  test("ramE2e: work-area tiling partitions each admin area exactly (no " +
    "boundary double-count, hole excluded)") {
    import org.apache.spark.sql.functions.col
    val rows = operators.Accessibility.ramE2e(spark, sf).collect()
      .filter(_.getLong(3) == 0) // one type's rows: one row per (nation, cell)
      .map(r => (r.getInt(0), r.getLong(4)))
    val perNation = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // independent recount: an origin is in nation nk's work area iff it
    // lies in the half-open outer rect minus the open hole interior —
    // cells tile that region, so the per-nation cell sums must equal
    // this direct predicate count exactly (a boundary origin counted in
    // two adjacent cells, or a hole leak, breaks the equality)
    val custs = Tables.customer(spark, sf).select(col("c_custkey"))
      .collect().map(_.getLong(0))
    val nations = Tables.nation(spark, sf)
      .select(col("n_nationkey")).collect().map(_.getInt(0))
    nations.foreach { nk =>
      val lat0 = (nk * 13 % 150 - 80).toDouble
      val lon0 = (nk * 29 % 330 - 175).toDouble
      val want = custs.count { k =>
        val lat = (k * 37 % 1700) / 10.0 - 85.0
        val lon = (k * 91 % 3600) / 10.0 - 180.0
        val inOuter = lon >= lon0 && lon < lon0 + 30.0 &&
          lat >= lat0 && lat < lat0 + 20.0
        val inHole = lon > lon0 + 6.0 && lon < lon0 + 18.0 &&
          lat > lat0 + 4.0 && lat < lat0 + 12.0
        inOuter && !inHole
      }
      assert(perNation.getOrElse(nk, 0L) == want.toLong,
        s"nation $nk: cells sum ${perNation.getOrElse(nk, 0L)} != direct $want")
    }
  }

  test("gridDensity: DBSCAN invariants — core density, border adjacency, noise isolation") {
    import org.apache.spark.sql.functions.col
    val minPts = 3
    // coarser cells than the sf0.01 default: at this spec's sf0.001 the
    // 8-degree histogram has no cell reaching minPts (all noise), which
    // vacuously passes the border/core assertions — 20 degrees yields
    // all three kinds (69 noise / 60 border / 21 core)
    val rows = operators.Accessibility
      .gridDensity(spark, sf, cellDeg = 20.0, minPts = minPts).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(rows.nonEmpty)
    val kinds = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(kinds.keySet == Set("core", "border", "noise"),
      s"expected all three kinds at this sf, got $kinds")
    val cellCount = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.length).toMap
    val coreCells = cellCount.filter(_._2 >= minPts).keySet
    rows.foreach { case (k, cx, cy, kind, cluster) =>
      val nbhCore = (-1 to 1).exists(dx => (-1 to 1).exists(dy =>
        coreCells.contains((cx + dx, cy + dy))))
      kind match {
        case "core" =>
          assert(coreCells.contains((cx, cy)), s"point $k: core in a sparse cell")
          assert(cluster.isDefined)
        case "border" =>
          assert(!coreCells.contains((cx, cy)) && nbhCore,
            s"point $k: border without an adjacent core cell")
          assert(cluster.isDefined)
        case "noise" =>
          assert(!nbhCore, s"point $k: noise next to a core cell")
          assert(cluster.isEmpty)
      }
    }
    // cluster labels: same cell -> same cluster; 8-adjacent core cells
    // -> same cluster (the components actually merged)
    val coreByCell = rows.filter(_._4 == "core")
      .groupBy(r => (r._2, r._3)).view.mapValues(_.map(_._5.get).distinct).toMap
    assert(coreByCell.values.forall(_.length == 1))
    coreByCell.foreach { case ((cx, cy), cls) =>
      val cl = cls.head
      (-1 to 1).foreach(dx => (-1 to 1).foreach(dy =>
        coreByCell.get((cx + dx, cy + dy)).foreach(other =>
          assert(other.head == cl,
            s"adjacent core cells (${cx},${cy})/(${cx + dx},${cy + dy}) in different clusters"))))
    }
  }

}
