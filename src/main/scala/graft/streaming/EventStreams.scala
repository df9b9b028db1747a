package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics in Structured Streaming form, with
  * batch-equivalent definitions of the same transforms.
  *
  * Each operation is ONE transform function applied to either a batch or
  * a streaming DataFrame — the logical plan is identical, so the batch
  * run (used by the driver's DuckDB oracle) certifies the semantics of
  * the streaming deployment. Streaming entry points add the watermark and
  * are exercised in the spec through MemoryStream.
  *
  * Scale posture: all three are keyed aggregations over bounded keys
  * (event_type x hour, user x session, dedup key), partial-agg friendly,
  * and watermarking bounds state size for unbounded input.
  */
object EventStreams {
  val Watermark = "1 hour"
  val SessionGap = "30 minutes"

  /** Tumbling 1-hour window counts/sums per event type. */
  def windowAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization per user via session_window (the streaming
    * operator); works identically on batch input. */
  def sessionize(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), SessionGap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("first_ts"), col("last_ts"),
        col("n_events"), col("sum_value"))

  /** At-most-once per (user, event_type, hour): keep the earliest event
    * per key. Batch form uses a deterministic row_number; the streaming
    * form is dropDuplicates within the watermark. */
  def dedupKeyed(events: DataFrame): DataFrame = {
    val keyed = events.withColumn("hr", date_trunc("hour", col("ts")))
    val w = Window.partitionBy(col("user_id"), col("event_type"), col("hr"))
      .orderBy(col("ts"), col("event_id"))
    keyed.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("hr"),
        col("event_id"), col("value"))
  }

  // ---- batch query surface (driver contract) ----

  def windowAggBatch(spark: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("first_ts"))

  def dedupBatch(spark: SparkSession, dir: String): DataFrame =
    dedupKeyed(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("event_type"), col("hr"))

  // ---- streaming entry points (same transforms + watermark) ----

  def windowAggStream(events: DataFrame): DataFrame =
    windowAgg(events.withWatermark("ts", Watermark))

  def sessionizeStream(events: DataFrame): DataFrame =
    sessionize(events.withWatermark("ts", Watermark))

  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", Watermark)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .dropDuplicates("user_id", "event_type", "hr")
      .select(col("user_id"), col("event_type"), col("hr"),
        col("event_id"), col("value"))
}
