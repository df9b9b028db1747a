package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextAnalysis}

/** Training-data pipeline operators added in round 3: sequence packing,
  * repetition signals, domain-mixture resampling, k-means assignment. */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSession._

  test("pack: offsets bounded, bins ordered, runs contiguous per source") {
    val budget = 128
    val p = TextAnalysis.pack(spark, sf).cache()
    try {
      assert(p.count() == Tables.documents(spark, sf).count())
      assert(p.filter(col("bin_offset") < 0 || col("bin_offset") >= budget).isEmpty)
      assert(p.filter(col("bin_last") < col("bin_first")).isEmpty)
      // reconstruct each doc's global start from (bin_first, bin_offset)
      // and check the per-source layout is exactly head-to-tail
      val rows = p.select(col("source"), col("doc_id"), col("n_tokens"),
          (col("bin_first") * budget + col("bin_offset")).as("start"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      rows.foreach { case (_, ds) =>
        var expectStart = 0L
        ds.sortBy(_._2).foreach { case (_, _, n, start) =>
          assert(start == expectStart, s"gap or overlap at start=$start")
          expectStart += n
        }
      }
      // a doc spans bin boundaries iff its token run crosses a multiple
      // of the budget
      assert(p.filter(
        (col("bin_last") =!= floor((col("bin_first") * budget
          + col("bin_offset") + col("n_tokens") - 1) / budget)).cast("boolean")).isEmpty)
    } finally { p.unpersist() }
  }

  test("repetition: exact values on a planted degenerate doc") {
    import spark.implicits._
    // "a a a b": top word a x3, bigrams [a a, a a, a b] -> top bigram 2/3
    val d = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionOf(d).collect().head
    assert(r.getAs[Int]("n_words") == 4)
    assert(r.getAs[Int]("top_word_n") == 3)
    assert(r.getAs[Int]("top_bigram_n") == 2)
    assert(r.getAs[Double]("dup_word_frac") == 0.5)
    assert(r.getAs[Double]("top_word_frac") == 0.75)
    assert(r.getAs[Double]("top_bigram_frac") == 0.6667)
  }

  test("repetition: bounds hold corpus-wide and all-distinct docs score 0") {
    val r = TextAnalysis.repetition(spark, sf).cache()
    try {
      assert(r.filter(col("top_word_n") > col("n_words")).isEmpty)
      assert(r.filter(col("dup_word_frac") < 0 || col("dup_word_frac") > 1
        || col("top_word_frac") <= 0 || col("top_word_frac") > 1
        || col("top_bigram_frac") <= 0 || col("top_bigram_frac") > 1).isEmpty)
      // no repeated word implies no repeated bigram either
      assert(r.filter(col("dup_word_frac") === 0 && col("top_bigram_n") > 1).isEmpty)
    } finally { r.unpersist() }
  }

  test("domain mix: per-source counts hit the floor(weight x n) quota") {
    val docs = Tables.documents(spark, sf)
    val kept = TextAnalysis.domainMix(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("kept"))
    val expect = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("sid",
        regexp_extract(col("source"), "([0-9]+)", 1).cast("int"))
      .withColumn("w", when(col("sid") % 3 === 0, 0.25)
        .when(col("sid") % 3 === 1, 0.5).otherwise(0.75))
      .select(col("source"), floor(col("n") * col("w")).as("want"))
    assert(expect.join(kept, Seq("source"), "left_outer")
      .filter(coalesce(col("kept"), lit(0L)) =!= col("want")).isEmpty)
    // deterministic: two runs produce identical row sets
    val a = TextAnalysis.domainMix(spark, sf)
    val b = TextAnalysis.domainMix(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("cluster assign: total coverage, valid seeds, self-assignment") {
    val ca = Similarity.clusterAssign(spark, sf).cache()
    try {
      assert(ca.count() == Tables.embeddings(spark, sf).count())
      assert(ca.filter(col("cluster_id") % 29 =!= 0).isEmpty)
      assert(ca.filter(col("cos_sim") > 1.0001).isEmpty)
      // a seed's own cosine with itself is 1.0 — nothing beats it
      assert(ca.filter(col("vec_id") % 29 === 0 &&
        (col("cluster_id") =!= col("vec_id") || col("cos_sim") < 0.9999)).isEmpty)
    } finally { ca.unpersist() }
  }
}
