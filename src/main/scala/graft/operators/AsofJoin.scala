package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of join: for each left row, the value columns of the latest right
  * row with right.ts <= left.ts (inclusive) for the same key; null when
  * no prior right row exists.
  *
  * Implementation is the merge pattern, not the naive inequality join:
  * tag both sides, union, one window pass per key ordered by (ts, side)
  * carrying the last non-null right value forward. Each input row is
  * shuffled exactly once on the key — the inequality-join formulation
  * fans out O(|left| x |right per key|) pairs and then aggregates them
  * away, which dies on 100 TB; this stays linear.
  */
object AsofJoin {

  /** @param keys       equi-join key columns (present on both sides)
    * @param tsCol      event-time column name (present on both sides)
    * @param valueCols  right-side columns to carry; emitted as `asof_<c>` */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    // Carry ONE struct of all right value columns, not one carried column
    // per value: per-column last(_, ignoreNulls) would substitute an older
    // non-null for a null in the latest row and could mix values from
    // different right rows. A struct is non-null whenever the row exists,
    // so the emitted values always come from the same (latest) right row,
    // nulls included.
    val r = right
      .select((keys :+ tsCol).map(col) :+
        struct(valueCols.map(col): _*).as("_r"): _*)
      .withColumn("_side", lit(0))
    val l = left.withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts => inclusive (<=) match
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(left.columns.toSeq.map(col) ++
        valueCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }

  /** Query surface: for each purchase event, the user's most recent click
    * value at or before it (right side pre-aggregated to one row per
    * (user, ts) so the match is deterministic). */
  def purchaseLastClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("click_value"))
    asofJoin(purchases, clicks, Seq("user_id"), "ts", Seq("click_value"))
      .withColumnRenamed("asof_click_value", "last_click_value")
      .orderBy(col("event_id"))
  }
}
