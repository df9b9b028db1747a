package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  import TestSession._

  test("HLL distinct estimate is within the configured error bound") {
    val rows = Sketches.distinctUsers(spark, sf, rsd = 0.02).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // HLL++ rsd is a standard deviation, not a hard bound — allow 5 sigma
      assert(r.getDouble(4) <= 0.10,
        s"${r.getString(0)}: rel_err ${r.getDouble(4)} vs exact ${r.getLong(2)}")
    }
  }

  test("approx quantiles are ordered and bracket the true median") {
    val rows = Sketches.valueQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99, s"${r.getString(0)}: not monotone")
    }
    // cross-check p50 of one group against the exact percentile
    val et = rows.head.getString(0)
    val exact = Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    val approx = rows.head.getDouble(1)
    // at 10k accuracy on test-scale data the sketch is near-exact
    assert(math.abs(approx - exact) <= math.max(1.0, math.abs(exact) * 0.05))
  }

  test("checked restatements: every within-contract verdict is true") {
    val d = Sketches.distinctUsersChecked(spark, sf).collect()
    assert(d.nonEmpty && d.forall(_.getBoolean(3)),
      "HLL estimate escaped its 3x-rsd bound")
    val q = Sketches.valueQuantilesChecked(spark, sf).collect()
    assert(q.nonEmpty &&
      q.forall(r => r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)),
      "a percentile estimate's true rank escaped its tolerance")
  }
}
