package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handling (enabled by [[graft.GraftSession]]) splits
  * oversized partitions at runtime, but only for sort-merge joins; salting
  * remains the tool of choice when one hot key dominates a hash join or
  * when the skew is known up front. The join result is identical for any
  * salt assignment, so correctness does not depend on the salt source.
  */
object Salting {

  /** Salted equi-join: the big (skewed) left side gets a per-row salt in
    * [0, nSalts); the right side is replicated nSalts times; the join key
    * becomes (keys..., salt), spreading each hot key over nSalts reducer
    * partitions. Right-side growth is nSalts x |right| — use for
    * dimension-sized right sides. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 nSalts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(nSalts > 1)
    // right_outer/full_outer would emit every unmatched right row once per
    // salt replica — only left-preserving join types are correct here.
    // "cross" is rejected too: with salted using-columns Spark degrades it
    // to an equi-join, silently behaving as inner — a keyed salted join
    // has no meaningful cross form.
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin replicates the right side; joinType '$joinType' would " +
        "duplicate unmatched right rows (use inner/left_outer/semi/anti)")
    // salt from a hash of the key columns + a cheap row-local component;
    // any distribution works (result is salt-invariant), this one avoids
    // rand() so reruns of the same partition layout are repeatable
    val l = left.withColumn("_salt",
      pmod(xxhash64(keys.map(col) :+ monotonically_increasing_id(): _*), lit(nSalts))
        .cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    l.join(r, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (keys, salt), then merge. For algebraic aggregates this is what
    * map-side partial aggregation already does — this explicit form helps
    * when the partial step is itself the bottleneck (e.g. huge per-key
    * collect-ish state) by bounding each reducer's share to 1/nSalts of
    * the hot key. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     nSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)))
    salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum"))
  }
}
