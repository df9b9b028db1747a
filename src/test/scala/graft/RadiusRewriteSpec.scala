package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RadiusJoinRewrite optimizer rule: a join written as the naive
  * `sqrt((dx)^2 + (dy)^2) <= r` predicate must plan as a grid-bucketed
  * equi-join, not a cartesian product, with identical results.
  */
class RadiusRewriteSpec extends AnyFunSuite {
  import TestSession._
  import graft.functions.GeoFunctions.euclidDeg

  private def origins = Tables.customer(spark, sf)
    .select(col("c_custkey"),
      graft.functions.GeoFunctions.latOf(col("c_custkey")).as("lat"),
      graft.functions.GeoFunctions.lonOf(col("c_custkey")).as("lon"))
  private def pois = Tables.supplier(spark, sf)
    .select(col("s_suppkey"),
      graft.functions.GeoFunctions.latOf(col("s_suppkey")).as("plat"),
      graft.functions.GeoFunctions.lonOf(col("s_suppkey")).as("plon"))

  test("naive radius join is rewritten to a bucketed equi-join with equal results") {
    val naive = origins.join(pois,
      euclidDeg(col("lat"), col("lon"), col("plat"), col("plon")) <= lit(25.0))
    val plan = naive.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"radius join was not rewritten:\n$plan")

    // baseline: same predicate phrased via pow() so the rule cannot match
    val brute = origins.join(pois,
      sqrt(pow(col("lat") - col("plat"), 2) + pow(col("lon") - col("plon"), 2))
        <= lit(25.0))
    val bplan = brute.queryExecution.executedPlan.toString
    assert(bplan.contains("CartesianProduct") ||
      bplan.contains("BroadcastNestedLoopJoin"),
      "baseline unexpectedly matched the rewrite — not a valid control")

    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(3))
    val got = naive.collect().map(key).toSet
    val expect = brute.collect().map(key).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("rewrite keeps legs straight when the right side is listed first") {
    val flipped = origins.join(pois,
      euclidDeg(col("plat"), col("plon"), col("lat"), col("lon")) <= lit(25.0))
    val plan = flipped.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = flipped.select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = operators.GeoJoins.radiusJoin(origins,
      pois.withColumnRenamed("plat", "lat").withColumnRenamed("plon", "lon"), 25.0)
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
  }

  test("rewrite handles mixed per-dimension operand order") {
    // dim 1 is left-first, dim 2 is right-first — the legs must orient
    // independently or the rewrite projects a right attribute over left
    val mixed = origins.join(pois,
      sqrt((col("lat") - col("plat")) * (col("lat") - col("plat")) +
        (col("plon") - col("lon")) * (col("plon") - col("lon"))) <= lit(25.0))
    val plan = mixed.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val got = mixed.select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = origins.join(pois,
      euclidDeg(col("lat"), col("lon"), col("plat"), col("plon")) <= lit(25.0))
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect && got.nonEmpty)
  }

  test("rewrite equals cartesian on random point clouds across radii") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def cloud(n: Int, prefix: String) =
      (0 until n).map(i => (i.toLong, rnd.nextDouble() * 170 - 85,
        rnd.nextDouble() * 360 - 180))
        .toDF(s"${prefix}id", s"${prefix}y", s"${prefix}x")
    val a = cloud(200, "a")
    val b = cloud(150, "b")
    Seq(0.5, 3.0, 17.0).foreach { r =>
      val fast = a.join(b,
        euclidDeg(col("ay"), col("ax"), col("by"), col("bx")) <= lit(r))
      assert(!fast.queryExecution.executedPlan.toString.contains("CartesianProduct"))
      val slow = a.join(b,
        sqrt(pow(col("ay") - col("by"), 2) + pow(col("ax") - col("bx"), 2)) <= lit(r))
      val k = (row: org.apache.spark.sql.Row) => (row.getLong(0), row.getLong(3))
      assert(fast.collect().map(k).toSet == slow.collect().map(k).toSet,
        s"radius $r mismatch")
    }
  }

  test("equi-join with an additional radius predicate is left alone") {
    val o = origins.withColumn("k", col("c_custkey") % 4)
    val p = pois.withColumn("k", col("s_suppkey") % 4)
    val mixed = o.join(p, o("k") === p("k") &&
      euclidDeg(col("lat"), col("lon"), col("plat"), col("plon")) <= lit(25.0))
    // an equi key already prevents the cartesian plan; the rule must not
    // double-bucket it
    val plan = mixed.queryExecution.optimizedPlan.toString
    assert(!plan.contains("_g_lc1"), plan)
  }
}
