package graft

/** Prints the join-operator shapes of every declared query's physical
  * plan — the evidence base for PruningSpec's plan-shape pins. Run with
  * `sbt "Test/runMain graft.PlanAudit"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val markers = Seq("CartesianProduct", "SortMergeJoin",
      "BroadcastNestedLoopJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan = fn(spark, TestSession.sf).queryExecution.executedPlan.toString
      val found = markers.filter(plan.contains)
      println(s"AUDIT $name: ${if (found.isEmpty) "no-join" else found.mkString(",")}")
    }
    spark.stop()
  }
}
