package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated TPC-H-ish testdata.
  *
  * Mirrors the reference's data-fetch layer
  * (ram-analysis/app/index.js:200-339) which pulls origins, POIs, admin
  * areas and file metadata from Postgres; here every entity is a parquet
  * table and Catalyst handles projection/filter pushdown into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")

  /** events.parquet's `ts` physical type varies by writer: TIMESTAMP
    * (NANOS) arrives as LongType nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * [[graft.GraftSession]]), and timestamp[us] with
    * isAdjustedToUTC=false arrives as TIMESTAMP_NTZ. Normalize both to
    * a proper TimestampType (microsecond, UTC session) column so every
    * downstream operator — including strict ones like `unix_micros` —
    * sees one type. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      // integer `div`, not `/`: Column./ is double division and ns-epoch
      // values exceed 2^53, which silently loses the low microsecond
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // session tz is UTC (GraftSession), so the cast is identity on
      // the stored microseconds — same instant the oracle reads
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
