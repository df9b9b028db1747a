package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HOT-KEY PROBE — the adversarial input the shape-preserving scale
  * replication cannot manufacture: a boilerplate sentence present in
  * EVERY document of a probe-scale corpus, so its shingles' document
  * frequency equals the corpus size. This is the r16-verdict hazard
  * class for the inverted-index operators (dedup_containment,
  * text_decontaminate, pipeline_curate's contamination step): with a
  * `collect_set + filter(df <= maxDF)` index the final aggregation
  * merge must materialize the hot shingle's corpus-sized doc set on
  * ONE reducer before the filter can drop it — heap death at 100 TB.
  * [[graft.functions.CappedDistinctSet]] abandons the set at the cap
  * inside the aggregation, so the probe's assertion is simply that the
  * operators COMPLETE at probe scale under the bench heap, return the
  * planted signal, and return nothing induced by the boilerplate.
  *
  * Corpus: `nDocs` documents, each `bodyTokens` unique tokens (token
  * space disjoint across docs) followed by the same boilerplate
  * sentence (7 tokens = five 3-shingles with df = nDocs, plus the
  * body-to-boilerplate crossing shingles with df = 1). Planted
  * signals: doc 1's FULL text is a prefix of doc 2's (containment
  * 1.0 despite a tiny Jaccard), and train doc 11 shares one rare
  * 5-token phrase (three distinct 3-shingles) with eval doc 20.
  *
  * Usage: runMain graft.HotKeyProbe [nDocs] (default 500000 — the
  * factor-100 probe's document count). Emits one JSON line; the
  * driver-visible artifact is HOTKEY_r{N}.json. */
object HotKeyProbe {

  val Boiler = "terms of service apply to all content"

  /** The synthetic corpus, built distributed (no driver-side rows):
    * every document carries [[Boiler]], so each of its shingles is a
    * corpus-wide hot key. */
  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val body = concat_ws(" ",
      (0 until 6).map(j => concat(lit(s"u${j}x"), col("id"))): _*)
    val rare = "quaint zephyr mosaic lantern drifts"
    spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") === 1,
        concat_ws(" ", lit("alpha beta gamma delta epsilon zeta"),
          lit(Boiler)))
      .when(col("id") === 2,
        // doc 1's whole text, then more: every doc-1 shingle (body,
        // boilerplate, and the crossing ones) appears here
        concat_ws(" ", lit("alpha beta gamma delta epsilon zeta"),
          lit(Boiler), lit("extra filler more noise pad tail")))
      .when(col("id") === 11,
        concat_ws(" ", lit(rare), body, lit(Boiler)))
      .when(col("id") === 20,
        concat_ws(" ", lit(rare), body, lit(Boiler)))
      .otherwise(concat_ws(" ", body, lit(Boiler)))
      .as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toLong).getOrElse(500000L)
    val cpus = GraftSession.defaultCpus
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus)
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = corpus(spark, nDocs).localCheckpoint()
    def timed[A](f: => A): (A, Double) = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // dedup_containment at probe scale: the planted pair must surface,
    // the df = nDocs boilerplate shingles must induce nothing
    val (cPairs, cSec) = timed {
      operators.Dedup.containmentOf(docs, n = 3, maxDF = 20,
          tau = 0.9, minSize = 5)
        .select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val cPlanted = cPairs.contains((1L, 2L))
    val cLeaked = cPairs.exists { case (a, b) =>
      !Set(a, b).subsetOf(Set(1L, 2L)) }

    // text_decontaminate at probe scale: train 11 x eval 20 shares the
    // rare phrase's three shingles (minShared = 3); boilerplate (in
    // every train x eval combination) must contribute no pair
    val (dPairs, dSec) = timed {
      operators.TextAnalysis.decontaminateOf(docs, n = 3, maxDF = 20,
          minShared = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val dPlanted = dPairs.contains((11L, 20L))
    val dLeaked = dPairs.exists(_ != ((11L, 20L)))

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    def r3(v: Double) = BigDecimal(v).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toString
    val ok = cPlanted && !cLeaked && dPlanted && !dLeaked
    println(s"""{"metric":"hotkey_probe","n_docs":$nDocs,""" +
      s""""hot_shingle_df":$nDocs,"heap_max_mb":$heapMb,"keys":{""" +
      s""""dedup_containment":{"sec":${r3(cSec)},"planted_pair":$cPlanted,"boiler_leak":$cLeaked},""" +
      s""""text_decontaminate":{"sec":${r3(dSec)},"planted_pair":$dPlanted,"boiler_leak":$dLeaked}},""" +
      s""""ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
