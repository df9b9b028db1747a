package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Bucketed

class BucketedSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed fact-fact join plans with no exchange on either side") {
    Bucketed.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Bucketed.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 8)
    // force a non-broadcast plan: the point is that the fact-fact merge
    // join needs no shuffle (at 100 TB neither side broadcasts anyway)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.readTable(spark, "b_orders")
        .join(Bucketed.readTable(spark, "b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // and it is correct
      val expect = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
