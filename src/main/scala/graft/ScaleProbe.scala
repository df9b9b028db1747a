package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE-DECADE SCALE PROBE — the empirical test of the 100 TB claim the
  * single-scale-factor bench gate cannot run: the slowest registry keys
  * are timed at sf0.1 AND at a 10x replication of it, and the per-key
  * scaling ratio is the artifact. A linear operator lands near 10x (or
  * below — fixed costs amortize); anything super-linear (O(n^2) creep,
  * a driver collect growing with the data, a broadcast crossing its
  * threshold into a different plan) shows as a ratio well past the
  * decade and gets adjudicated with a plan read (SURVEY §7).
  *
  * The 10x replication is SHAPE-preserving, not a naive copy — a naive
  * union of 10 identical copies would manufacture cross-copy duplicate
  * clusters (every doc pairs with its 9 clones: candidate counts then
  * scale with copies², an artifact of the construction, not the
  * operator), so each copy is made DISJOINT from the others in every
  * similarity space while keeping the within-copy structure intact:
  *   - keys shift by copy * (max+1) (referential structure per copy);
  *   - document tokens get a per-copy suffix (token/shingle/n-gram
  *     spaces disjoint across copies, identical within a copy);
  *   - embeddings get a per-copy deterministic hash perturbation
  *     (breaks exact-duplicate geometry; within-copy neighborhoods
  *     essentially unchanged at 1e-3 amplitude).
  * Dup-density, vocabulary growth, and cluster structure per unit of
  * data therefore match the base corpus — the ratio measures the
  * OPERATOR's scaling, not the generator's.
  *
  * Usage: runMain graft.ScaleProbe [baseDir] [scaledDir] [factor]
  * (defaults /root/testdata/sf0.1, /tmp/graft_sf1, 10). Emits one JSON
  * line; the driver-visible artifact is SCALE_r{N}.json. */
object ScaleProbe {

  /** The probe set: the slowest keys of the r15 bench (BENCH_r15
    * `slowest`) — where super-linear creep would cost the most. */
  val probeKeys: Seq[String] = Seq(
    "ann_nndescent", "emb_dedup_final", "text_kn_perplexity",
    "dedup_final", "ann_nprobe_sweep", "dedup_lsh_sweep",
    "pipeline_paraphrase", "geo_dbscan", "graph_modularity",
    "dedup_containment")

  /** Build the 10x shape-preserving replication under `dst`. */
  def buildScaled(spark: SparkSession, src: String, dst: String,
                  factor: Int): Unit = {
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).collect().head.getLong(0) + 1L

    def copies(df: DataFrame)(mk: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => mk(df, i)).reduce(_.unionByName(_))

    // keyed dimension tables: shift the key per copy, carry the rest
    def keyShift(name: String, key: String): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      val m = maxOf(df, key)
      copies(df) { (d, i) =>
        d.withColumn(key, col(key) + lit(i * m))
      }.write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    keyShift("customer", "c_custkey")
    keyShift("supplier", "s_suppkey")

    // documents: per-copy token suffix — token spaces disjoint across
    // copies, so dedup/shingle structure scales linearly by design
    locally {
      val d = spark.read.parquet(s"$src/documents.parquet")
      val m = maxOf(d, "doc_id")
      copies(d) { (df, i) =>
        val text =
          if (i == 0) col("text")
          else concat_ws(" ", transform(split(col("text"), " "),
            t => concat(t, lit(s"~$i"))))
        df.select((col("doc_id") + lit(i * m)).as("doc_id"),
          text.as("text"), col("lang"), col("source"),
          length(text).as("n_chars"))
      }.write.mode("overwrite").parquet(s"$dst/documents.parquet")
    }

    // embeddings: per-copy deterministic perturbation (1e-3 amplitude)
    locally {
      val e = spark.read.parquet(s"$src/embeddings.parquet")
      val m = maxOf(e, "vec_id")
      copies(e) { (df, i) =>
        val emb =
          if (i == 0) col("embedding")
          else expr(s"""transform(embedding, (x, j) ->
            CAST(x + CAST(pmod(xxhash64(vec_id, j, $i), 1000) AS FLOAT)
              / CAST(1000000 AS FLOAT) AS FLOAT))""")
        df.select((col("vec_id") + lit(i * m)).as("vec_id"),
          emb.as("embedding"), col("label"))
      }.write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    }

    // remaining tables ride unscaled (no probe key reads them; present
    // so fingerprints and incidental loads resolve)
    Seq("region", "nation", "orders", "lineitem", "part", "events")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
    // completion marker LAST (r16 ADVICE): records what was built, so a
    // crashed or different-parameter previous build is detected and
    // rebuilt instead of silently reused (stale scaled data poisons
    // every ratio in SCALE_r{N}.json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(scaledMarker(dst)),
      markerContent(src, factor).getBytes("UTF-8"))
  }

  private def scaledMarker(dst: String): String = s"$dst/_GRAFT_SCALED"
  private def markerContent(src: String, factor: Int): String =
    s"base=$src\nfactor=$factor\n"

  /** True iff a prior [[buildScaled]] COMPLETED with the same base and
    * factor — the marker is written as the build's last step. */
  def scaledIsCurrent(src: String, dst: String, factor: Int): Boolean = {
    val p = java.nio.file.Paths.get(scaledMarker(dst))
    java.nio.file.Files.exists(p) &&
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8") ==
        markerContent(src, factor)
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val scaled = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus)
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!scaledIsCurrent(base, scaled, factor))
      buildScaled(spark, base, scaled, factor)

    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    def timeOne(fn: (SparkSession, String) => DataFrame,
                dir: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[scale] FAILED at $dir: ${e.getMessage}")
          -1.0
        }
      }
      if (ts.exists(_ < 0)) -1.0 else ts.min
    }
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toString

    val keys = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSeq).getOrElse(probeKeys)
    val rows = keys.flatMap { k =>
      SparkEntry.queries.get(k).map { fn =>
        val tB = timeOne(fn, base)
        val tS = timeOne(fn, scaled)
        val ratio = if (tB > 0 && tS >= 0) tS / tB else -1.0
        System.err.println(f"[scale] $k%-22s base=${r3(tB)}s " +
          f"scaled=${r3(tS)}s ratio=${r3(ratio)}")
        k -> (tB, tS, ratio)
      }
    }
    val qs = rows.map { case (k, (b, s, r)) =>
      s"""\"$k\":{"base":${r3(b)},"scaled":${r3(s)},"ratio":${r3(r)}}"""
    }.mkString("{", ",", "}")
    val worst = rows.filter(_._2._3 >= 0).sortBy(-_._2._3).take(3)
      .map { case (k, (_, _, r)) => s"""\"$k\":${r3(r)}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","factor":$factor,"base":"$base","scaled":"$scaled","reps":$reps,"keys":$qs,"worst_ratios":$worst}""")
    spark.stop()
  }
}
