package graft

/** Scratch audit: the candidate-doc semi-join must sit BELOW the shingle
  * projection in ngramJaccard's verify stage. */
object ShinglePlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = TestSession.spark
    val plan = operators.Dedup.ngramJaccard(spark, TestSession.sf)
      .queryExecution.optimizedPlan.toString
    val lines = plan.linesIterator.toSeq
    val semiIdx = lines.indexWhere(_.contains("Join LeftSemi"))
    val shingleProjIdx = lines.indexWhere(l =>
      l.contains("word_shingles") && l.contains("shingles"))
    // smaller printed index = nearer the root = executes LATER; the semi
    // join must be DEEPER (larger index) than the shingle projection so
    // shingling happens after pruning
    println(s"CHECK semi@$semiIdx shingleProj@$shingleProjIdx " +
      (if (semiIdx >= 0 && shingleProjIdx >= 0 && semiIdx > shingleProjIdx)
        "OK-pruned-before-shingling" else "REGRESSED"))
    spark.stop()
  }
}
