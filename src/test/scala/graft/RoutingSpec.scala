package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Routing

class RoutingSpec extends AnyFunSuite {
  import TestSession._

  private lazy val edges = Routing.roadEdges(spark, sf)
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  private lazy val sources = Tables.supplier(spark, sf)
    .filter(col("s_suppkey") % 41 === 1)
    .collect().map(_.getLong(0)).toSeq

  /** Reference Bellman-Ford, same relaxation order as the operator:
    * round h reads only round h-1's distances. */
  private def bellmanFord(hops: Int): Map[(Long, Long), Double] = {
    val out = scala.collection.mutable.Map.empty[(Long, Long), Double]
    for (s <- sources) {
      var dist = Map(s -> 0.0)
      for (_ <- 1 to hops) {
        val next = scala.collection.mutable.Map.empty[Long, Double] ++ dist
        for ((u, v, w) <- edges; du <- dist.get(u)) {
          val cand = du + w
          if (next.get(v).forall(cand < _)) next(v) = cand
        }
        dist = next.toMap
      }
      dist.foreach { case (n, d) => out((s, n)) = d }
    }
    out.toMap
  }

  test("road graph is simple, self-loop free and degree-bounded") {
    assert(edges.nonEmpty)
    assert(edges.forall { case (s, d, w) => s != d && w > 0.0 })
    assert(edges.map(e => (e._1, e._2)).distinct.length == edges.length)
    // 0-based node space: every supplier key is a node, the ring covers
    // all of them, and no edge escapes the key range
    val keys = Tables.supplier(spark, sf).collect().map(_.getLong(0)).toSet
    assert(edges.forall { case (s, d, _) => keys.contains(s) && keys.contains(d) })
    val ring = edges.collect { case (s, d, _) if d == (s + 1) % keys.size => s }
    assert(ring.toSet == keys, "ring successor missing for some node")
  }

  test("routeEta equals in-memory Bellman-Ford bitwise (after the same rounding)") {
    val expected = bellmanFord(Routing.DefaultHops).map { case (k, d) =>
      k -> BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Routing.routeEta(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    val diffs = got.collect { case (k, v) if v != expected(k) =>
      s"$k: got $v expected ${expected(k)}" }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
    // sources reach themselves at zero
    sources.foreach(s => assert(got((s, s)) == 0.0))
  }

  test("more hops never lengthens a route, and strictly extends reach on the ring") {
    val h2 = bellmanFord(2)
    val h6 = bellmanFord(Routing.DefaultHops)
    assert(h2.keySet.subsetOf(h6.keySet))
    h2.foreach { case (k, d) => assert(h6(k) <= d) }
  }

  test("door-to-door: walk leg + routed leg with null propagation, vs in-memory") {
    def latOf(k: Long) = (k * 37 % 1700) / 10.0 - 85.0
    def lonOf(k: Long) = (k * 91 % 3600) / 10.0 - 180.0
    def sq(x: Double) = x * x
    val matrix = bellmanFord(Routing.DefaultHops).map { case (k, d) =>
      k -> BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val routeMin = matrix.toSeq.collect {
      case ((s, n), d) if n % 4 == 0 => s -> d
    }.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2).min }
    val origins = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0))
    val expected = origins.map { c =>
      val cands = sources.map(s => (math.sqrt(
        sq(latOf(c) - latOf(s)) + sq(lonOf(c) - lonOf(s))), s))
        .filter(_._1 <= 60.0)
      if (cands.isEmpty) c -> None
      else {
        val (d, s) = cands.min
        c -> routeMin.get(s).map(r => BigDecimal(d * 111.0 / 4.0 * 3600.0 + r)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          .orElse(Some(Double.NaN)).filterNot(_.isNaN)
      }
    }.toMap
    val got = Routing.routeDoorToDoor(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.keySet == origins.toSet)
    val diffs = got.collect { case (k, v) if v != expected(k) =>
      s"$k: got $v expected ${expected(k)}" }
    assert(diffs.isEmpty, diffs.take(5).mkString("; "))
    // both populated and cut-off origins must exist at this sf
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
  }

  test("routeNearestPoi keeps every (src, type) with the per-type routed min") {
    val eta = Routing.routeEta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val types = eta.map(_._2 % 4).distinct.sorted
    val got = Routing.routeNearestPoi(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.size == sources.size * types.length)
    got.foreach { case ((s, t), v) =>
      val mins = eta.filter(e => e._1 == s && e._2 % 4 == t).map(_._3)
      assert(v == (if (mins.isEmpty) None else Some(mins.min)))
    }
  }

  test("isochrone coverage: dense bands, monotone cumulative, matrix-consistent") {
    val eta = Routing.routeEta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    val sources = eta.map(_._1).distinct
    val rows = Routing.isochroneCoverage(spark, sf).collect()
    assert(rows.length == sources.length * 6, "spine must be dense")
    rows.groupBy(_.getLong(0)).foreach { case (src, rs) =>
      val byBin = rs.sortBy(_.getInt(1))
      assert(byBin.map(_.getInt(1)).sameElements(0 until 6))
      val cums = byBin.map(_.getLong(4))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      // cumulative count at each band == nodes within that time bound
      byBin.foreach { r =>
        val expect = eta.count(e => e._1 == src &&
          math.min(math.floor(e._2 / 750000.0), 5.0) <= r.getInt(1))
        assert(r.getLong(4) == expect,
          s"src $src band ${r.getInt(1)}: ${r.getLong(4)} != $expect")
      }
      assert(byBin.map(_.getLong(3)).sum == cums.last)
    }
  }
}
