package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/** Spatial joins that never cross-join the world.
  *
  * The reference bounds its POI search with an expanding buffer around
  * each work square (ram-analysis/app/calculate-eta/utils.js:47,
  * tasks.js:73-87). The scale-correct Spark equivalent is a grid-bucketed
  * equi-join: bucket both sides into cells of edge == search radius,
  * replicate the *small* side to its 3x3 cell neighborhood, and join on
  * the cell key. Any pair within radius R necessarily shares a
  * neighborhood cell, so the result is exactly `dist <= R` — but the plan
  * is an equi-join Catalyst can broadcast or shuffle-partition, instead
  * of a cartesian product.
  *
  * At 100 TB: the origins side is never replicated or shuffled when
  * `broadcastRight=true` (POIs are dims); for large-large cases the join
  * shuffles both sides by cell key only.
  */
object GeoJoins {

  /** All (left, right) pairs with planar distance <= radiusDeg.
    *
    * @param left  big side with columns `lat`, `lon` (not replicated)
    * @param right small side with columns `lat`, `lon` (replicated x9)
    * @param joinType "inner" or "left_outer" (left_outer keeps lefts with
    *                 no neighbor; right columns null)
    * @param extraKeys columns present under the same name on BOTH sides
    *                  that must also match (they join the equi-key set,
    *                  e.g. the POI type for a per-type nearest search);
    *                  the right-side copy is dropped from the output
    */
  def radiusJoin(left: DataFrame, right: DataFrame, radiusDeg: Double,
                 broadcastRight: Boolean = true,
                 joinType: String = "inner",
                 extraKeys: Seq[String] = Nil): DataFrame = {
    val l = left
      .withColumn("_lcx", cellX(col("lon"), radiusDeg))
      .withColumn("_lcy", cellY(col("lat"), radiusDeg))
    val rBase = extraKeys.foldLeft(
      right.withColumnRenamed("lat", "_rlat").withColumnRenamed("lon", "_rlon")) {
      (df, k) => df.withColumnRenamed(k, s"_rk_$k")
    }
    // replicate each right row to its 9-cell neighborhood
    val r0 = rBase
      .withColumn("_dx", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("_dy", explode(array(lit(-1), lit(0), lit(1))))
      .withColumn("_rcx", cellX(col("_rlon"), radiusDeg) + col("_dx"))
      .withColumn("_rcy", cellY(col("_rlat"), radiusDeg) + col("_dy"))
      .drop("_dx", "_dy")
    val r = if (broadcastRight) broadcast(r0) else r0
    val dist = euclidDeg(col("lat"), col("lon"), col("_rlat"), col("_rlon"))
    val keyCond = extraKeys
      .map(k => col(k) === col(s"_rk_$k"))
      .foldLeft(col("_lcx") === col("_rcx") && col("_lcy") === col("_rcy"))(_ && _)
    l.join(r, keyCond && dist <= radiusDeg, joinType)
      .withColumn("dist_deg",
        when(col("_rlat").isNotNull, dist))
      .drop(Seq("_lcx", "_lcy", "_rcx", "_rcy") ++
        extraKeys.map(k => s"_rk_$k"): _*)
  }
}
