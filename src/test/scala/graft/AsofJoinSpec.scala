package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  import TestSession._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("asof join carries the latest prior value, inclusive at equal ts") {
    import spark.implicits._
    val left = Seq((1L, t(10), "p1"), (1L, t(20), "p2"), (2L, t(5), "p3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, t(10), 100.0), (1L, t(15), 150.0), (3L, t(1), 999.0))
      .toDF("k", "ts", "v")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v"))
      .orderBy("tag").collect()
    assert(out(0).getDouble(3) == 100.0) // p1 at ts=10 matches right at ts=10 (inclusive)
    assert(out(1).getDouble(3) == 150.0) // p2 at ts=20 matches latest (15)
    assert(out(2).isNullAt(3))           // k=2 has no right rows
  }

  test("null in the latest right row is emitted, not replaced by older values") {
    import spark.implicits._
    val left = Seq((1L, t(30), "p1")).toDF("k", "ts", "tag")
    // latest right row (t=20) has v=null, w=7; older row (t=10) has v=5, w=1.
    // Correct output: (null, 7) — the latest ROW's values, not a per-column mix.
    val right = Seq((1L, t(10), Some(5.0), 1L), (1L, t(20), None, 7L))
      .toDF("k", "ts", "v", "w")
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", Seq("v", "w")).head()
    assert(out.isNullAt(3), "asof_v must keep the latest row's null")
    assert(out.getLong(4) == 7L)
  }

  test("asof equals naive inequality-join formulation on real events") {
    val viaMerge = AsofJoin.purchaseLastClick(spark, sf)
      .collect().map(r => (r.getLong(0), Option(r.get(4)))).toMap
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val c = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("cu"), col("ts").as("cts"))
      .agg(max(col("value")).as("cv"))
    val naive = p.join(c, col("pu") === col("cu") && col("cts") <= col("pts"), "left")
      .groupBy(col("event_id"))
      .agg(max_by(col("cv"), col("cts")).as("last_click_value"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(viaMerge == naive)
  }
}
