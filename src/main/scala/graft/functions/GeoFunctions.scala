package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.SparkBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, DoubleType, StructField, StructType}

/** Static geo math callable from both interpreted eval and generated code. */
object GeoMath {
  final val EarthRadiusKm = 6371.0088
  /** Great-circle distance in km (spherical haversine). */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLon / 2), 2)
    2 * EarthRadiusKm * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Even-odd ray-cast point-in-polygon (the PNPOLY algorithm, W. R.
    * Franklin — public domain). Vertices as parallel lat/lon arrays,
    * open or closed ring both accepted. Points exactly on an edge are
    * undefined (callers pick polygon bounds off the data lattice). */
  def pointInPolygon(lat: Double, lon: Double,
                     latArr: ArrayData, lonArr: ArrayData): Boolean = {
    val n = math.min(latArr.numElements(), lonArr.numElements())
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val yi = latArr.getDouble(i); val xi = lonArr.getDouble(i)
      val yj = latArr.getDouble(j); val xj = lonArr.getDouble(j)
      if ((yi > lat) != (yj > lat) &&
          lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Shoelace-weighted polygon center of mass over the normalized rings
    * shape (rings -> points -> [lon, lat]; ring 0 = outer, rest holes —
    * the GeoJSON Polygon convention). The turf `centerOfMass` analog:
    * the reference replaces non-point POIs by this point before routing
    * (ram-analysis/app/calculate-eta/tasks.js:64-69).
    *
    * Winding-agnostic: each ring's contribution is normalized to
    * positive orientation, then the outer ring adds and holes subtract.
    * Rings may be open or closed (a duplicated closing point contributes
    * a zero cross term). Returns null for degenerate (zero-area) input.
    * Returns (lat, lon) as an InternalRow for the struct-typed
    * expression. */
  def polyCenterOfMass(rings: ArrayData): InternalRow = {
    var sumA = 0.0; var sumX = 0.0; var sumY = 0.0
    var r = 0
    while (r < rings.numElements()) {
      val ring = rings.getArray(r)
      val n = ring.numElements()
      var a = 0.0; var cx = 0.0; var cy = 0.0
      var i = 0
      while (i < n) {
        val j = if (i + 1 == n) 0 else i + 1
        val p1 = ring.getArray(i); val p2 = ring.getArray(j)
        val x1 = p1.getDouble(0); val y1 = p1.getDouble(1)
        val x2 = p2.getDouble(0); val y2 = p2.getDouble(1)
        val cross = x1 * y2 - x2 * y1
        a += cross; cx += (x1 + x2) * cross; cy += (y1 + y2) * cross
        i += 1
      }
      // a = 2 * signed ring area; sign-normalize, outer adds, holes subtract
      val s = (if (a >= 0.0) 1.0 else -1.0) * (if (r == 0) 1.0 else -1.0)
      sumA += s * a; sumX += s * cx; sumY += s * cy
      r += 1
    }
    if (sumA == 0.0) null
    else new GenericInternalRow(
      Array[Any](sumY / (3.0 * sumA), sumX / (3.0 * sumA)))
  }

  /** Clip one ring against a half-plane (one Sutherland–Hodgman stage).
    * `axis` 0 = x, 1 = y; keepGE keeps coords >= c, else <= c. Intersection
    * points pin the clipped coordinate to EXACTLY the boundary value `c`
    * (not an interpolation that lands near it), so axis-aligned subject
    * edges against axis-aligned windows stay FP-exact — the property the
    * integer-scaled oracle scheme relies on. Axis-parallel edges never
    * cross their own axis boundary (both endpoints share the coord), so
    * the interpolation below cannot divide by zero there. */
  private def clipHalf(pts: Array[Array[Double]], axis: Int, c: Double,
                       keepGE: Boolean): Array[Array[Double]] = {
    val n = pts.length
    if (n == 0) return pts
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    def in(v: Double): Boolean = if (keepGE) v >= c else v <= c
    def cross(s: Array[Double], e: Array[Double]): Array[Double] = {
      val t = (c - s(axis)) / (e(axis) - s(axis))
      val o = 1 - axis
      val ov = s(o) + t * (e(o) - s(o))
      if (axis == 0) Array(c, ov) else Array(ov, c)
    }
    var i = 0
    while (i < n) {
      val s = pts(i); val e = pts(if (i + 1 == n) 0 else i + 1)
      val eIn = in(e(axis))
      if (eIn) {
        if (!in(s(axis))) out += cross(s, e)
        out += e
      } else if (in(s(axis))) out += cross(s, e)
      i += 1
    }
    out.toArray
  }

  /** Sutherland–Hodgman clip of a ring (points as [x, y]) against the
    * axis-aligned rectangle [x0, x1] x [y0, y1] — the reference's
    * per-grid-square work-area step (`intersect(adminArea, square)`,
    * ram-analysis/app/calculate-eta/index.js:69): the clip window there
    * is always a squareGrid cell, i.e. convex and axis-aligned, which is
    * exactly the window class S-H clips exactly. Arbitrary SIMPLE
    * (including non-convex) subject rings are supported — S-H's
    * standard precondition; a self-intersecting subject yields
    * undefined area (the property suite demonstrated one whose clip
    * exceeded its own shoelace area). Admin-area rings are simple by
    * construction. The empty result (ring entirely outside) is the
    * reference's no-intersection skip (tasks.js:36). Output ring is
    * open, same convention as the input. */
  def clipRingToRect(ring: ArrayData, bounds: ArrayData): ArrayData = {
    val x0 = bounds.getDouble(0); val y0 = bounds.getDouble(1)
    val x1 = bounds.getDouble(2); val y1 = bounds.getDouble(3)
    var cur = Array.tabulate(ring.numElements()) { i =>
      val p = ring.getArray(i)
      Array(p.getDouble(0), p.getDouble(1))
    }
    cur = clipHalf(cur, 0, x0, keepGE = true)
    cur = clipHalf(cur, 0, x1, keepGE = false)
    cur = clipHalf(cur, 1, y0, keepGE = true)
    cur = clipHalf(cur, 1, y1, keepGE = false)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      cur.map(p => new org.apache.spark.sql.catalyst.util.GenericArrayData(p)
        : Any))
  }

  /** Twice the unsigned shoelace area of a ring (points as [x, y], open
    * or closed). Returned un-halved so integer-coordinate rings stay
    * integer-exact (a rectangle's 2A is always even; a general lattice
    * polygon's 2A is an odd or even integer, never a fraction). */
  def ringArea2(ring: ArrayData): Double = {
    val n = ring.numElements()
    var a = 0.0
    var i = 0
    while (i < n) {
      val j = if (i + 1 == n) 0 else i + 1
      val p1 = ring.getArray(i); val p2 = ring.getArray(j)
      a += p1.getDouble(0) * p2.getDouble(1) - p2.getDouble(0) * p1.getDouble(1)
      i += 1
    }
    math.abs(a)
  }
}

/** `point_in_poly(lat, lon, poly_lats, poly_lons)` -> boolean; arbitrary
  * (including non-convex) polygons, codegen'd — the turf `within` analog
  * (ram-analysis/app/calculate-eta/utils.js:28) for real admin-area
  * polygons rather than bbox approximations. */
case class PointInPolygon(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
  extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_in_poly"

  override def nullSafeEval(lat: Any, lon: Any, lats: Any, lons: Any): Any =
    GeoMath.pointInPolygon(lat.asInstanceOf[Double], lon.asInstanceOf[Double],
      lats.asInstanceOf[ArrayData], lons.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GeoMath.pointInPolygon($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** Native Catalyst expression for haversine distance — stays inside
  * whole-stage codegen (single static call, no UDF serialization).
  *
  * Used by the real-coordinate API; oracle-checked queries use planar
  * [[GeoFunctions.euclidDeg]] instead because libm (sin/cos/asin) is not
  * bit-reproducible across engines (SURVEY.md §6).
  */
case class HaversineKm(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
  extends QuaternaryExpression {
  // children are cast to double by the Column wrapper (AbstractDataType is
  // private[sql] in Spark 4, so ExpectsInputTypes isn't implementable here)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "haversine_km"

  override def nullSafeEval(lat1: Any, lon1: Any, lat2: Any, lon2: Any): Any =
    GeoMath.haversineKm(lat1.asInstanceOf[Double], lon1.asInstanceOf[Double],
      lat2.asInstanceOf[Double], lon2.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GeoMath.haversineKm($a, $b, $c, $d)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(first = f, second = s, third = t, fourth = q)
}

/** `poly_center_of_mass(rings)` -> struct<com_lat, com_lon> | null.
  * Shoelace-weighted centroid with hole support over the normalized
  * GeoJSON rings structure ([[graft.sources.GeoJson.readPolygonsJsonl]]
  * shape). Codegen'd: one static call per row, no UDF serialization. */
case class PolyCenterOfMass(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("com_lat", DoubleType), StructField("com_lon", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "poly_center_of_mass"

  override def nullSafeEval(rings: Any): Any =
    GeoMath.polyCenterOfMass(rings.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoMath.polyCenterOfMass($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `clip_ring_rect(ring, bounds)` -> the Sutherland–Hodgman clip of the
  * ring against the axis-aligned rectangle bounds = [x0, y0, x1, y1] —
  * the turf `intersect(adminArea, square)` work-area step
  * (ram-analysis/app/calculate-eta/index.js:69) as a codegen'd
  * expression: one static call per (area, cell) row, no UDF
  * serialization, runs map-side wherever the candidate cells were
  * derived. Empty array = no intersection (tasks.js:36 skip case). */
case class ClipRingToRect(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = ArrayType(ArrayType(DoubleType))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "clip_ring_rect"

  override def nullSafeEval(ring: Any, bounds: Any): Any =
    GeoMath.clipRingToRect(ring.asInstanceOf[ArrayData],
      bounds.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, b) =>
      s"graft.functions.GeoMath.clipRingToRect($r, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** `ring_area2(ring)` -> twice the unsigned shoelace area (see
  * [[GeoMath.ringArea2]] for why un-halved). */
case class RingArea2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ring_area2"

  override def nullSafeEval(ring: Any): Any =
    GeoMath.ringArea2(ring.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, r => s"graft.functions.GeoMath.ringArea2($r)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Geo column functions. The RAM reference works on WGS84 points
  * (villages/POIs) and 30 km square grids (ram-analysis/app/
  * calculate-eta/index.js:62); here the grid/tile/distance algebra is
  * expressed with codegen'd built-ins so Catalyst can push and prune
  * around it.
  */
object GeoFunctions {
  def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    SparkBridge.column(HaversineKm(
      SparkBridge.expression(lat1.cast("double")),
      SparkBridge.expression(lon1.cast("double")),
      SparkBridge.expression(lat2.cast("double")),
      SparkBridge.expression(lon2.cast("double"))))

  def point_in_poly(lat: Column, lon: Column,
                    polyLats: Column, polyLons: Column): Column =
    SparkBridge.column(PointInPolygon(
      SparkBridge.expression(lat.cast("double")),
      SparkBridge.expression(lon.cast("double")),
      SparkBridge.expression(polyLats), SparkBridge.expression(polyLons)))

  /** Point-in-MultiPolygon with hole support over the normalized
    * GeoJSON rings structure ([[graft.sources.GeoJson.readPolygonsJsonl]]
    * shape: polygons -> rings -> points -> [lon, lat]). Even-odd rule
    * across ALL rings: a point inside an outer ring AND inside a hole
    * ring flips twice and lands outside — exactly GeoJSON winding-free
    * containment. Composes the codegen'd ray-cast per ring via
    * higher-order aggregate, so it stays expression-only (no UDF). */
  def point_in_multipoly(lat: Column, lon: Column, rings: Column): Column =
    aggregate(flatten(rings), lit(false), (acc, ring) =>
      acc =!= point_in_poly(lat, lon,
        transform(ring, p => element_at(p, 2)),
        transform(ring, p => element_at(p, 1))))

  /** Polygon (with holes) center of mass — see [[GeoMath.polyCenterOfMass]]. */
  def poly_center_of_mass(rings: Column): Column =
    SparkBridge.column(PolyCenterOfMass(SparkBridge.expression(rings)))

  /** Sutherland–Hodgman ring clip against an axis-aligned rectangle —
    * see [[GeoMath.clipRingToRect]]. `bounds` = [x0, y0, x1, y1]. */
  def clip_ring_rect(ring: Column, bounds: Column): Column =
    SparkBridge.column(ClipRingToRect(
      SparkBridge.expression(ring), SparkBridge.expression(bounds)))

  /** Twice the unsigned shoelace area — see [[GeoMath.ringArea2]]. */
  def ring_area2(ring: Column): Column =
    SparkBridge.column(RingArea2(SparkBridge.expression(ring)))

  /** Deterministic synthetic coordinates derived from an integer key
    * (SURVEY.md §3) — integer-exact modular arithmetic so Spark and the
    * DuckDB oracle agree bitwise. */
  def latOf(key: Column): Column = (key * 37L % 1700L) / 10.0 - 85.0
  def lonOf(key: Column): Column = (key * 91L % 3600L) / 10.0 - 180.0

  /** Planar distance in degrees — +,-,*,sqrt only (IEEE-exact). */
  def euclidDeg(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    sqrt((lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2))

  /** Square-grid cell assignment (squareGrid analog): cell indices for a
    * given cell edge in degrees. */
  def cellX(lon: Column, cellDeg: Double): Column =
    floor((lon + 180.0) / cellDeg).cast("long")
  def cellY(lat: Column, cellDeg: Double): Column =
    floor((lat + 90.0) / cellDeg).cast("long")

  /** Slippy-tile assignment at zoom z (ram-vt tiling analog;
    * equirectangular y so the math stays IEEE-exact). */
  def tileX(lon: Column, z: Int): Column =
    floor((lon + 180.0) / 360.0 * (1 << z)).cast("long")
  def tileY(lat: Column, z: Int): Column =
    floor((lit(90.0) - lat) / 180.0 * (1 << z)).cast("long")

  /** Travel seconds to cover `distDeg` planar degrees at `speedKmh`,
    * 111 km per degree (reference uses km/h speeds + seconds budgets,
    * ram-analysis/app/calculate-eta/utils.js:48). */
  def travelSeconds(distDeg: Column, speedKmh: Double): Column =
    distDeg * 111.0 / speedKmh * 3600.0

  /** The reference's poisInBuffer pre-filter bbox (ram-analysis/app/
    * calculate-eta/utils.js:47-56): the area bbox grown by `km`
    * travel distance (111 km/deg), clamped to the world box the
    * reference tests against (lat +/-85, lon +/-180), with its
    * RangeError('World buffer overflow') surfaced as a typed `overflow`
    * flag — raised exactly when ALL four buffered sides exceed the
    * world box, as in the reference — so a caller treats an overflowed
    * buffer as "no pre-filter" instead of an exception storm. Returns
    * struct(lat0, lon0, lat1, lon1, overflow). NOTE the clamp bound is
    * the reference's mercator-ish +/-85: callers whose data can carry
    * |lat| > 85 must widen or skip the clamp. */
  def buffered_bbox(lat0: Column, lon0: Column, lat1: Column, lon1: Column,
                    km: Column): Column = {
    val d = km / 111.0
    val bLat0 = lat0 - d; val bLat1 = lat1 + d
    val bLon0 = lon0 - d; val bLon1 = lon1 + d
    struct(
      greatest(bLat0, lit(-85.0)).as("lat0"),
      greatest(bLon0, lit(-180.0)).as("lon0"),
      least(bLat1, lit(85.0)).as("lat1"),
      least(bLon1, lit(180.0)).as("lon1"),
      (bLat0 < -85.0 && bLat1 > 85.0 && bLon0 < -180.0 && bLon1 > 180.0)
        .as("overflow"))
  }
}
