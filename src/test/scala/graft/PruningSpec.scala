package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that scans prune: predicate pushdown reaches the parquet
  * reader, projections narrow ReadSchema, and partitioned layouts get
  * partition-level pruning — the properties SURVEY.md §5 relies on.
  */
class PruningSpec extends AnyFunSuite {
  import TestSession._

  test("filters and projection push into the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }

  test("partitioned write prunes partitions at read time") {
    val path = "target/tmp-sources/events_by_type"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    val df = spark.read.parquet(path).filter(col("event_type") === "click")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // only the click partition is actually read
    val all = spark.read.parquet(path).count()
    val clicks = df.count()
    assert(clicks > 0 && clicks < all)
  }
}
