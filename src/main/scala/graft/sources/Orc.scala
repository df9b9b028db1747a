package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC ingest/egress — the columnar interchange format for warehouses
  * that are not parquet-native (Hive/Trino estates). Spark's `orc`
  * source is fully distributed in both directions and carries the same
  * scan-time virtues the engine's parquet posture relies on: column
  * pruning (ReadSchema) and predicate pushdown into the stripe/row-group
  * indexes (PushedFilters) — both asserted in the spec, because a
  * format the optimizer cannot prune would silently read 100 TB to
  * answer a 2-column query.
  *
  * Ingest discipline mirrors [[Jsonl]]: an EXPLICIT schema, never
  * inferred (footer-based inference is cheap for ORC but pins the
  * pipeline to whatever a producer last wrote; declaring the contract
  * surfaces drift as a read error instead of a silent widening), and
  * the declared schema is enforced as a strict subset of the file
  * schema at read time.
  */
object Orc {

  /** Write a frame as ORC, one file per partition (zstd: the same
    * default trade-off Spark ships for parquet). */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  /** Read ORC under `path` against an explicit `schema` (a projection
    * contract: only the declared columns are read — column pruning is
    * the schema's job, not a downstream select's). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
