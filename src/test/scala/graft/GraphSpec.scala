package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  import TestSession._

  test("components: each 64-key block is exactly one component") {
    val rows = Graph.components(spark, sf).collect()
    assert(rows.nonEmpty)
    // the edge scheme is block-local, so a component never crosses its
    // block, and chain edges connect the whole block, so it never
    // splits either
    val byBlock = rows.groupBy(r => r.getLong(0) / Graph.CcBlock)
    byBlock.foreach { case (blk, members) =>
      val comps = members.map(_.getLong(1)).distinct
      assert(comps.length == 1, s"block $blk split into $comps")
      assert(comps.head / Graph.CcBlock == blk,
        s"block $blk labeled from a foreign block: ${comps.head}")
      members.foreach(m => assert(m.getLong(2) == members.length,
        s"block $blk: component_size ${m.getLong(2)} != ${members.length}"))
    }
    // every node appears exactly once
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  test("components: pointer jumping converges well under the O(diameter) bound") {
    // CcBlock=64 chains would need ~63 plain hash-min rounds; the jump
    // makes maxIter=16 ample — tightening to 10 must still converge
    val rows = Graph.components(spark, sf, maxIter = 10).collect()
    assert(rows.nonEmpty)
  }

  test("minLabelComponents: self-loops, duplicate edges, isolated nodes") {
    import spark.implicits._
    // components {1,2,3} (with a self-loop and a duplicated edge),
    // {5,6}, and isolated 9 — which appears in NO edge
    val edges = Seq((2L, 1L), (2L, 3L), (2L, 3L), (1L, 1L), (6L, 5L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("id")
    val got = Graph.minLabelComponents(edges, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      9L -> 9L))
  }
}
