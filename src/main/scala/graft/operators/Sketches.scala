package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sketch-based approximate aggregation — the operators that replace
  * exact shuffles when 100 TB cardinalities make them unaffordable.
  *
  * Both are single-pass, fixed-size-state, partial-agg friendly: the
  * HLL++ registers / KLL-style quantile buffers merge associatively, so
  * map-side partials keep the shuffle at O(sketch size x groups), not
  * O(distinct values). Declared rows-only for the oracle — sketch
  * internals are engine-specific — but each query also carries the exact
  * answer at test scale so the approximation error is visible and
  * spec-bounded.
  */
object Sketches {

  /** Distinct users per event type: HLL++ estimate vs exact, with the
    * relative error. At scale the exact column is the one you'd drop. */
  def distinctUsers(spark: SparkSession, dir: String,
                    rsd: Double = 0.02): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .withColumn("rel_err",
        round(abs(col("approx_users") - col("exact_users")) /
          col("exact_users"), 4))
      .orderBy(col("event_type"))

  /** Value quantiles per event type via the approximate percentile
    * sketch (mergeable, bounded state), emitted as scalar columns. */
  def valueQuantiles(spark: SparkSession, dir: String,
                     accuracy: Int = 10000): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("_q"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        round(element_at(col("_q"), 1), 2).as("p50"),
        round(element_at(col("_q"), 2), 2).as("p90"),
        round(element_at(col("_q"), 3), 2).as("p99"),
        col("n_events"))
      .orderBy(col("event_type"))
}
