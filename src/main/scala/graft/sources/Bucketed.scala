package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins.
  *
  * Writing both fact tables bucketed + sorted on the join key means every
  * subsequent join on that key is planned as a sort-merge join with NO
  * exchange on either side — the shuffle is paid once at write time and
  * amortized over every downstream query. This is the 100 TB answer for
  * repeatedly-joined fact/fact pairs (e.g. orders x lineitem), where
  * neither side is broadcastable and re-shuffling per query would
  * dominate the plan (spec-checked: the joined plan contains no Exchange).
  */
object Bucketed {

  /** Persist `df` as a bucketed, in-bucket-sorted managed table.
    * Idempotent: drops a same-named table AND any orphaned warehouse
    * directory (a metastore-less restart leaves the files behind, and
    * CREATE TABLE refuses to reuse the location). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
