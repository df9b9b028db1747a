package graft.tools

/** Ad-hoc single-query runner for local debugging:
  * `sbt "runMain graft.tools.Smoke q42_op_log /root/testdata/sf0.001"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("smoke")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    args(0).split(",").foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(s"SMOKE $q rows=${df.count()}")
    }
    spark.stop()
  }
}
