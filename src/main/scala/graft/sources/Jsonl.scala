package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced JSONL (one JSON object per line) ingest/egress — the
  * interchange format LLM corpus pipelines actually move documents in.
  * Spark's json source IS line-delimited by default, so both directions
  * stay fully distributed (one file per partition, no driver collect);
  * what this adds over a bare read is the ingest discipline:
  *
  *  - an EXPLICIT target schema (never inferred: inference needs an
  *    extra full pass over 100 TB and silently widens types on dirty
  *    data),
  *  - PERMISSIVE corrupt-record capture into a `_corrupt` column, so a
  *    bad line costs one quarantined row, not a failed job (same triage
  *    contract as [[graft.operators.Multimodal.quarantine]]),
  *  - a split into (valid, quarantined) frames the caller writes to
  *    separate sinks.
  */
object Jsonl {

  /** Quarantine column name — kept out of the valid-side schema. */
  val CorruptCol = "_corrupt"

  /** Write a frame as JSONL, one shard per partition. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** The two sides of a quarantine-split read plus the lifecycle handle
    * for the shared parse cache both sides are computed from. `release()`
    * drops the cache; call it once both sides are consumed (unpersisting
    * `valid`/`quarantined` themselves would be a no-op — only the
    * internal parsed frame is registered with the cache manager). */
  final case class SplitRead(valid: DataFrame, quarantined: DataFrame,
                             private val raw: DataFrame) {
    def release(): Unit = { raw.unpersist(blocking = false); () }
  }

  /** Read JSONL under `path` against `schema`: returns valid rows in
    * the target schema and quarantined raw lines. A line is quarantined
    * if it is not a JSON object or any field fails to convert to its
    * declared type — Spark nulls the row's other fields and stores the
    * raw line in [[CorruptCol]].
    *
    * The read is cached before splitting: Spark refuses a query that
    * selects only the corrupt column from an uncached json scan (the
    * raw line is only retained while the row is being parsed), and the
    * two branches would otherwise each re-read and re-parse the input.
    * The caller owns the cache lifecycle via [[SplitRead.release]]. */
  def readSplit(spark: SparkSession, path: String, schema: StructType)
      : SplitRead = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"target schema must not contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val valid = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    SplitRead(valid, quarantined, raw)
  }

  /** Streaming ingest of a watched JSONL directory: new shards are
    * picked up per micro-batch, split valid/quarantined, and landed as
    * parquet under `validOut` / `quarOut` with batch-id-scoped overwrite
    * (the same idempotence recipe as
    * [[graft.streaming.EventStreams.idempotentParquetSink]]: a replayed
    * batch overwrites its own output, never appends duplicates). The
    * split happens once per batch on a cached frame — one parse per
    * line, both sinks, and the corrupt-column-only projection is legal
    * because the batch is cached. */
  def ingestStream(spark: SparkSession, path: String, schema: StructType,
                   validOut: String, quarOut: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"target schema must not contain $CorruptCol")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    val raw = spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
    raw.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.persist()
        try {
          batch.filter(col(CorruptCol).isNull)
            .select(schema.fieldNames.map(col).toSeq: _*)
            .write.mode("overwrite").parquet(s"$validOut/batch_id=$id")
          batch.filter(col(CorruptCol).isNotNull)
            .select(col(CorruptCol).as("raw_line"))
            .write.mode("overwrite").parquet(s"$quarOut/batch_id=$id")
        } finally { batch.unpersist() }
        ()
    }
  }
}
