package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Salting

class SaltingSpec extends AnyFunSuite {
  import TestSession._

  test("salted join equals plain join on skewed data") {
    import spark.implicits._
    // one hot key (90% of rows) + long tail
    val left = spark.range(2000)
      .select(when(col("id") < 1800, 7L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = Seq((7L, "hot"), (1900L, "cold"), (5L, "unmatched-left")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(left, right, Seq("k")).select("k", "payload", "name")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.size == 1801)
  }

  test("salted join equals plain left_outer join, rejects right-preserving types") {
    import spark.implicits._
    val left = spark.range(100).select(pmod(col("id"), lit(5)).as("k"), col("id").as("p"))
    val right = Seq((0L, "a"), (1L, "b"), (99L, "nomatch")).toDF("k", "name")
    val plain = left.join(right, Seq("k"), "left_outer")
      .select("k", "p", "name").collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(left, right, Seq("k"), joinType = "left_outer")
      .select("k", "p", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    // right-side replication would emit unmatched right rows nSalts times
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(left, right, Seq("k"), joinType = "right_outer")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(left, right, Seq("k"), joinType = "full_outer")
    }
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val df = Tables.orders(spark, TestSession.sf)
    val direct = df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2)))).toSet
    val salted = Salting.saltedCountSum(df, Seq("o_orderstatus"), "o_totalprice")
      .collect().map(r => (r.getString(0), r.getLong(1), math.round(r.getDouble(2)))).toSet
    assert(salted == direct)
  }

  test("dropOriginStats resets checkpoint statistics, preserves rows") {
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.SparkBridge
    // a join-of-joins whose propagated estimate compounds — the shape
    // every iterative loop carries round over round
    val df = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    var frame = df.localCheckpoint()
    val conf = spark.sessionState.conf.defaultSizeInBytes
    (1 to 3).foreach { _ =>
      val grown = frame.join(frame.withColumnRenamed("a", "c"), Seq("b"))
        .select(col("b"), col("a")).localCheckpoint()
      // WITHOUT the reset the estimate squares each round; with it the
      // carried frame re-enters the next round at the conf default
      val reset = SparkBridge.dropOriginStats(grown)
      assert(reset.queryExecution.optimizedPlan.stats.sizeInBytes == conf,
        "propagated stats must be dropped at the round boundary")
      assert(reset.count() == grown.count(), "reset must not change rows")
      frame = reset
    }
    // the Project-over-LogicalRDD shape (next.drop(col)) works too
    val projected = SparkBridge.dropOriginStats(
      df.withColumn("x", lit(1)).localCheckpoint().drop("x"))
    assert(projected.columns.sameElements(Array("a", "b")))
    assert(projected.count() == 3)
  }
}
