package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus)
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT, codegen compiler, parquet footers for every
    // input table — otherwise whichever query touches a table first
    // absorbs its one-time open cost and the per-query times are noise
    try {
      SparkEntry.entry(spark).count()
      Tables.names.filterNot(_ == "events")
        .foreach(t => Tables.load(spark, sfDir, t).count())
      Tables.events(spark, sfDir).count() // special-cased ts normalization
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    // profiling hooks: SPARK_GRAFT_ONLY=q1,q2 runs a subset;
    // SPARK_GRAFT_REPS=N times each query N times and keeps the minimum.
    // Default 3 reps + an explicit GC before each query: the queries share
    // one JVM, so a single pass leaves individual timings at the mercy of
    // GC pauses triggered by earlier queries (observed 1.2 s -> 8 s
    // swings); min-of-3 after a collection attributes time to the query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          // a broken query must read as broken, not as a fast time:
          // record the -1 sentinel and keep benchmarking the rest
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      }
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    // The harness keeps only the LAST ~2000 chars of stdout. Keep the line
    // small (3 dp — ms resolution is all GC noise allows anyway) and put
    // the headline total/failed/sf AFTER the per-query map so they survive
    // even if the map's head is truncated out of the tail window.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","queries":$qs,"failed":$failedJson,"sf":"$sfDir","n":${results.size},"unit":"sec","value":${r3(total)}}""")
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries failed: ${failed.mkString(", ")}")
    spark.stop()
  }
}
