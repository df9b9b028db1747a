package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSession {
  lazy val spark: SparkSession = GraftSession.local("graft-test", "4")
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and is non-degenerate") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("every query has either an oracle or is documented rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val rowsOnly = Set(
      "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
      "ann_ivf_topk", "mm_features", "text_fingerprint", "stream_anomaly")
    assert(noOracle.subsetOf(rowsOnly),
      s"queries missing oracle and not declared rows-only: ${noOracle -- rowsOnly}")
  }

  test("q1 aggregates are grouped correctly") {
    val rows = operators.Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 9) // <= |returnflag| x |linestatus|
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags.size == rows.length, "group keys must be unique")
  }

  test("q8 rank is within bounds per nation") {
    val rows = operators.Relational.q8WindowRank(spark, sf).collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length))
    }
  }
}
