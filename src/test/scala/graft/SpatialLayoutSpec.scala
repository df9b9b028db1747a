package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SpatialLayout

class SpatialLayoutSpec extends AnyFunSuite {
  import TestSession._

  test("zValue is monotone-ish: nearby points share high bits, antipodes don't") {
    import spark.implicits._
    val df = Seq((10.0, 10.0), (10.001, 10.001), (-80.0, 170.0))
      .toDF("lat", "lon")
      .select(SpatialLayout.zValue(col("lat"), col("lon")).as("z"))
    val zs = df.collect().map(_.getLong(0))
    // ~0.001 deg apart: may straddle a fine cell, but must share the
    // coarse prefix of the curve (differ only in the low bits)
    assert((zs(0) >> 8) == (zs(1) >> 8), "nearby points must share z prefix")
    assert((zs(0) >> 24) != (zs(2) >> 24), "antipodes must not share prefix")
    // z stays within 32 bits
    zs.foreach(z => assert(z >= 0 && z <= 0xFFFFFFFFL))
  }

  test("z-ordered layout gives each file a tight spatial envelope") {
    val origins = Tables.customer(spark, sf)
      .select(col("c_custkey"),
        graft.functions.GeoFunctions.latOf(col("c_custkey")).as("lat"),
        graft.functions.GeoFunctions.lonOf(col("c_custkey")).as("lon"))
    val dir = new java.io.File("target/tmp-sources/zorder")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val path = dir.getAbsolutePath
    SpatialLayout.writeZOrdered(origins, "lat", "lon", path, numFiles = 8)

    val back = spark.read.parquet(path)
    assert(back.count() == origins.count(), "layout must not drop rows")

    // per-file lat coverage: z-ordered files must each span a fraction of
    // the world; an arrival-order write spans ~all of it in every file
    val perFile = back
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("lat")) - min(col("lat"))).as("lat_span"),
        (max(col("lon")) - min(col("lon"))).as("lon_span"))
      .collect()
    assert(perFile.length >= 4, "range partitioning must produce multiple files")
    val avgLatSpan = perFile.map(_.getDouble(1)).sum / perFile.length
    val avgLonSpan = perFile.map(_.getDouble(2)).sum / perFile.length
    // world is 170 x 360; clustered files must average well under half
    assert(avgLatSpan < 85.0, s"avg lat span $avgLatSpan too wide — not clustered")
    assert(avgLonSpan < 180.0, s"avg lon span $avgLonSpan too wide — not clustered")
  }
}
