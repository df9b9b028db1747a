package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions._

/** Registers graft's native expressions in the SQL function registry, so
  * `spark.sql("SELECT simhash64(word_shingles(text, 3)) ...")` works the
  * same as the Column API. Activate with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (done by
  * [[GraftSession]]) or `--conf spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // plan a bare distance-radius join as a grid-bucketed equi-join
    // instead of a cartesian product (see RadiusJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.RadiusJoinRewrite)

    def reg(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage), builder))

    reg("haversine_km", "haversine_km(lat1, lon1, lat2, lon2) - great-circle km") {
      args => HaversineKm(args(0), args(1), args(2), args(3))
    }
    reg("word_shingles", "word_shingles(text, n) - word n-gram shingles") {
      args => WordShingles(args(0), intArg(args(1), "word_shingles"))
    }
    reg("minhash_signature", "minhash_signature(shingles, k) - k-hash MinHash signature") {
      args => MinHashSignature(args(0), intArg(args(1), "minhash_signature"))
    }
    reg("simhash64", "simhash64(tokens) - 64-bit SimHash") {
      args => SimHash64(args(0))
    }
    reg("winnow_fingerprint", "winnow_fingerprint(text, k, w) - winnowing fingerprint") {
      args => WinnowFingerprint(args(0),
        intArg(args(1), "winnow_fingerprint"), intArg(args(2), "winnow_fingerprint"))
    }
    reg("cosine_sim", "cosine_sim(a, b) - cosine similarity of float/double vectors") {
      args => CosineSimilarity(args(0), args(1))
    }
    reg("l2_dist", "l2_dist(a, b) - Euclidean distance of float/double vectors") {
      args => L2Distance(args(0), args(1))
    }
    reg("point_in_poly", "point_in_poly(lat, lon, poly_lats, poly_lons) - ray-cast point in polygon") {
      args => PointInPolygon(args(0), args(1), args(2), args(3))
    }
    reg("vec_simhash", "vec_simhash(vec, nBits) - random-hyperplane LSH signature of a float vector") {
      args => VecSimHash(args(0), intArg(args(1), "vec_simhash"))
    }
    reg("poly_center_of_mass", "poly_center_of_mass(rings) - shoelace centroid with hole support") {
      args => PolyCenterOfMass(args(0))
    }
  }
}
