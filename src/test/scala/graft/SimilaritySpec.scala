package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions.cosine_sim
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  import TestSession._

  test("cosine_sim matches hand computation on floats") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b").select(cosine_sim(col("a"), col("b")).as("c"))
    val got = df.head().getDouble(0)
    val expect = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - expect) < 1e-12, s"$got vs $expect")
  }

  test("cosine_sim rejects int arrays and mixed float/double at analysis time") {
    import spark.implicits._
    val ints = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(cosine_sim(col("a"), col("b"))).collect()
    }
    val mixed = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      mixed.select(cosine_sim(col("a"), col("b"))).collect()
    }
    // and via the SQL registry (the path ADVICE flagged)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim(array(1, 2), array(3, 4))").collect()
    }
  }

  test("cosine_sim of a vector with itself is 1") {
    val one = Similarity.bruteTopK(spark, sf, k = 1, nQueries = 3)
    one.collect().foreach(r => assert(r.getDouble(3) < 1.0)) // self excluded
  }

  test("brute topk returns k rows per query with descending scores") {
    val rows = Similarity.bruteTopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF probing all cells equals brute force exactly") {
    val brute = Similarity.bruteTopK(spark, sf).collect().map(_.toSeq)
    val ivfAll = Similarity.ivfTopK(spark, sf, nCells = 16, nProbe = 16)
      .collect().map(_.toSeq)
    assert(brute.sameElements(ivfAll))
  }

  test("IVF with partial probing returns subset-quality results") {
    val rows = Similarity.ivfTopK(spark, sf, nProbe = 4).collect()
    assert(rows.nonEmpty)
    // every query still gets results, ranked correctly
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val rks = rs.map(_.getInt(1)).sorted
      assert(rks.sameElements(1 to rks.length))
    }
  }

  test("LSH near-dup: perfect precision, bounded recall vs brute force") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val brute = a.crossJoin(b).filter(col("va") < col("vb"))
      .withColumn("cos", cosine_sim(col("ea"), col("eb")))
      .filter(col("cos") >= 0.35)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupLsh(spark, sf)
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "cosine-verified candidates can never be false positives")
    assert(brute.nonEmpty)
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.4, s"recall $recall (${lsh.size}/${brute.size})")
  }

  test("near-dup pairs are above threshold and ordered") {
    val rows = Similarity.nearDup(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.35)
    }
  }

  test("l2_dist matches hand computation and rejects mixed types") {
    import spark.implicits._
    import graft.functions.VectorFunctions.l2_dist
    val d = Seq((Array(1.0f, 2.0f, 2.0f), Array(0.0f, 0.0f, 0.0f)))
      .toDF("a", "b").select(l2_dist(col("a"), col("b"))).head().getDouble(0)
    assert(d == 3.0)
    // analysis is eager in select(), so the throw happens there
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1.0f), Array(1.0)))
        .toDF("a", "b").select(l2_dist(col("a"), col("b"))).collect()
    }
  }

  test("semanticDedup: clusters consistent with the exact pair list") {
    val rows = Similarity.semanticDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val cluster = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1)),
        "survivor iff representative")
      assert(cluster(r.getLong(1)) == r.getLong(1),
        "a cluster id must be its own representative")
    }
    // every exact near-dup pair landed in one cluster
    Similarity.nearDup(spark, sf).collect().foreach { p =>
      assert(cluster(p.getLong(0)) == cluster(p.getLong(1)),
        s"pair ${p.getLong(0)},${p.getLong(1)} split across clusters")
    }
  }

  test("PQ codes reference real seeds; a seed reconstructs itself exactly") {
    val rows = Similarity.pqCodes(spark, sf).collect()
    assert(rows.nonEmpty)
    val seeds = rows.map(_.getLong(0)).filter(_ % 31 == 0).toSet
    assert(seeds.nonEmpty)
    rows.foreach { r =>
      (1 to 4).foreach(i => assert(seeds.contains(r.getLong(i)),
        s"vec ${r.getLong(0)}: code ${r.getLong(i)} is not a seed id"))
      assert(r.getDouble(5) >= 0.0)
      // a codeword is its own nearest codeword in every subspace
      if (seeds.contains(r.getLong(0))) {
        (1 to 4).foreach(i => assert(r.getLong(i) == r.getLong(0),
          s"seed ${r.getLong(0)} quantized to ${r.getLong(i)}"))
        assert(r.getDouble(5) == 0.0)
      }
    }
  }
}
