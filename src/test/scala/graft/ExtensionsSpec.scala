package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopK.top_k_by_score

class ExtensionsSpec extends AnyFunSuite {
  import TestSession._

  test("graft functions are callable from SQL") {
    val r = spark.sql(
      "SELECT haversine_km(48.8566d, 2.3522d, 51.5074d, -0.1278d) AS d").head()
    assert(math.abs(r.getDouble(0) - 343.6) < 1.0)
    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS s").head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val sim = spark.sql(
      "SELECT simhash64(word_shingles('a b c d e f', 2)) AS s").head().getLong(0)
    assert(sim != 0L)
    val mh = spark.sql(
      "SELECT minhash_signature(word_shingles('a b c d e f', 2), 16) AS m")
      .head().getSeq[Long](0)
    assert(mh.length == 16)
    val cs = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head().getDouble(0)
    assert(math.abs(cs - 1.0) < 1e-12)
    val vs = spark.sql(
      "SELECT vec_simhash(array(CAST(1.0 AS FLOAT), CAST(-2.0 AS FLOAT)), 16) AS z")
      .head().getLong(0)
    assert(vs >= 0L && vs <= 0xFFFFL)
    val com = spark.sql(
      """SELECT poly_center_of_mass(array(array(
           array(0.0d, 0.0d), array(6.0d, 0.0d), array(0.0d, 6.0d)))) AS c""")
      .select(col("c.com_lat"), col("c.com_lon")).head()
    assert(com.getDouble(0) == 2.0 && com.getDouble(1) == 2.0)
  }

  test("top_k_by_score keeps exactly k best with deterministic ties") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.9), (1L, 13L, 0.1),
      (2L, 20L, 0.5)).toDF("g", "id", "score")
    val out = df.groupBy(col("g"))
      .agg(top_k_by_score(col("score"), col("id"), 2).as("top"))
      .orderBy("g").collect()
    val g1 = out(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(_.getLong(1)) == Seq(10L, 12L)) // 0.9 tie -> lower id first
    assert(out(1).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)) == Seq(20L))
  }

  test("top_k_by_score agrees with window row_number on real data") {
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), (col("vec_id") % 7).as("g"),
        (col("vec_id") * 37 % 101).cast("double").as("score"))
    val viaAgg = scored.groupBy(col("g"))
      .agg(top_k_by_score(col("score"), col("vec_id"), 3).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id").as("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("vec_id"))
    val viaWin = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).select(col("g"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAgg == viaWin)
  }
}
