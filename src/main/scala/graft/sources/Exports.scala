package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV / JSON result exports mirroring the reference's generateCSV /
  * generateJSON (ram-analysis/app/index.js:560-604): CSV flattens nested
  * `poi.*` fields into dotted columns; JSON groups result rows per admin
  * area. Both stay distributed — flattening is a projection, grouping is
  * an aggregation — only the file layout differs from a plain write.
  */
object Exports {

  /** Recursively flatten struct columns into dotted top-level columns
    * (e.g. poi.school -> "poi.school"), the generateCSV shape. */
  def flatten(df: DataFrame): DataFrame = {
    def cols(schema: StructType, prefix: String): Seq[Column] =
      schema.fields.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case st: StructType => cols(st, name)
          case _ => Seq(col(s"`${name.split('.').mkString("`.`")}`").as(name))
        }
      }.toSeq
    df.select(cols(df.schema, ""): _*)
  }

  /** Write a (possibly nested) frame as headered CSV with dotted columns. */
  def writeFlatCsv(df: DataFrame, path: String): Unit =
    flatten(df).write.mode("overwrite").option("header", "true").csv(path)

  /** Group rows into a JSON array per key: one output row per key with a
    * deterministic (sorted) JSON array of the member objects — the
    * generateJSON "results by admin area" shape. */
  def groupedJson(df: DataFrame, keyCol: String): DataFrame = {
    val payload = df.columns.filterNot(_ == keyCol).toSeq.map(c => df(c).as(c))
    df.select(col(keyCol), to_json(struct(payload: _*)).as("_j"))
      .groupBy(col(keyCol))
      .agg(concat(lit("["),
        concat_ws(",", sort_array(collect_list(col("_j")))),
        lit("]")).as("json"))
  }

  /** JSON-encode one scalar (or nested) column: to_json only accepts
    * struct/array/map, so wrap the value in a single-field struct and strip
    * the canonical `{"k":` / `}` wrapper (to_json emits no whitespace).
    * Handles quoting/escaping of string keys for free. */
  private[sources] def jsonEncoded(c: Column): Column = {
    // ignoreNullFields=false keeps a null key as {"k":null}, so the
    // wrapper strip below yields the JSON literal with no special case
    val wrapped = to_json(struct(c.as("k")), Map("ignoreNullFields" -> "false"))
    wrapped.substr(lit(6), length(wrapped) - 6)
  }

  /** The reference's results/results_poi two-table batch insert
    * (ram-analysis/app/index.js:122-134): parent rows get ids, child rows
    * reference them. The Spark-scale equivalent writes both tables in one
    * pass using the NATURAL key as the foreign key — database-generated
    * surrogate ids (or monotonically_increasing_id) are non-deterministic
    * across retries/re-runs, which breaks idempotent re-writes at scale.
    *
    * @param df        denormalized rows (one per parent x child)
    * @param parentKey columns identifying a parent row
    * @param childCols columns belonging to the child table
    */
  def writeNormalized(df: DataFrame, parentKey: Seq[String],
                      childCols: Seq[String], dir: String): Unit = {
    val parentCols = df.columns.filterNot(childCols.contains).toSeq
    val nonKey = parentCols.filterNot(parentKey.contains)
    // one row per parentKey, GUARANTEED: distinct() over the non-child
    // columns would silently emit multiple parent rows (and fan out the
    // child join) if some column is not functionally dependent on the
    // key; picking the lexicographic-min attribute tuple per key is
    // deterministic for well-behaved and degenerate inputs alike
    val parent =
      if (nonKey.isEmpty) df.select(parentCols.map(col): _*).distinct()
      else df.groupBy(parentKey.map(col): _*)
        .agg(min(struct(nonKey.map(col): _*)).as("_p"))
        .select(parentKey.map(col) ++
          nonKey.map(c => col(s"_p.$c").as(c)): _*)
        .select(parentCols.map(col): _*)
    val child = df.select((parentKey ++ childCols).map(col): _*)
    parent.write.mode("overwrite").parquet(s"$dir/results.parquet")
    child.write.mode("overwrite").parquet(s"$dir/results_child.parquet")
  }

  /** Query surface for the CSV-flatten export (the generateCSV shape,
    * ram-analysis/app/index.js:565-604, where nested `poi.school` /
    * `poi.eta` result fields become dotted CSV headers): per-nation
    * order rollups are assembled into the reference's nested result
    * shape — a two-level `poi.eta.*` struct plus a `region.*` struct —
    * and [[flatten]] projects them to dotted top-level columns. The
    * hashed output pins the recursive dotting (two levels deep), the
    * deterministic column order, and the aggregate values; money is
    * integer cents so both engines agree bitwise. All three dims
    * broadcast; the one shuffle is the fact-side aggregation. */
  def exportCsvFlat(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame = {
    import graft.Tables
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir)
      .select(col("r_regionkey"), col("r_name"))
    // the fact-dim join shuffles on the key (customer does NOT
    // broadcast at 100 TB); nation/region are constant-sized
    val agg = o.join(c.hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
    val nested = agg
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("nation"),
        struct(col("n_orders"),
          struct(col("cents")).as("eta")).as("poi"),
        struct(col("r_name").as("name")).as("region"))
    flatten(nested).orderBy(col("nation"))
  }

  /** Write the grouped-JSON frame as one JSON object file shape:
    * {"key": [...], ...} per partition line-oriented — each line is
    * `"<key>": [...]` so a downstream cat/wrap produces the reference's
    * single-object export. */
  def writeGroupedJson(df: DataFrame, keyCol: String, path: String): Unit =
    groupedJson(df, keyCol)
      .select(concat(jsonEncoded(col(keyCol)), lit(": "), col("json")).as("value"))
      .write.mode("overwrite").text(path)
}
