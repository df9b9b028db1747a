package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) spatial file layout.
  *
  * Parquet data skipping works off per-file/row-group min-max stats; a
  * table appended in arrival order has every file spanning the whole
  * world, so a bbox query reads everything. Sorting by the interleaved
  * Morton code before writing clusters spatially-near rows into the same
  * files, giving each file a tight lat/lon envelope — bbox filters then
  * prune most files from the scan. This is the standard lakehouse
  * OPTIMIZE ZORDER BY recipe, expressed with plain sortWithinPartitions
  * + repartitionByRange so it composes with any writer.
  *
  * The Morton code is built from built-in expressions only (scaled
  * lat/lon to 16-bit ints, bits spread via shift-and-mask), so it stays
  * inside whole-stage codegen.
  */
object SpatialLayout {

  /** Spread the low 16 bits of v so bit i lands at position 2i
    * (the classic Morton bit-twiddle, expressed as Column algebra). */
  private[sources] def spreadBits16(v: Column): Column = {
    var x = v.bitwiseAND(lit(0xFFFFL))
    x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00FF00FFL))
    x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x33333333L))
    x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two PRE-BINNED integer coordinates, each
    * already in [0, 65535] — the generic interleave [[zValue]] wraps
    * for lat/lon and [[SnapshotLog.compactZOrder]] uses for arbitrary
    * column pairs. Stays inside whole-stage codegen. */
  def zValue16(x: Column, y: Column): Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** 32-bit Morton code of (lat, lon) at 16-bit resolution per axis
    * (~600 m cells at the equator — finer than any practical file). */
  def zValue(lat: Column, lon: Column): Column = {
    val yi = floor((lat + 90.0) / 180.0 * 65535.0).cast("long")
    val xi = floor((lon + 180.0) / 360.0 * 65535.0).cast("long")
    spreadBits16(xi).bitwiseOR(shiftleft(spreadBits16(yi), 1))
  }

  /** Write `df` parquet with rows clustered along the Morton curve:
    * range-partition by z (each output file covers one contiguous curve
    * segment), sort within partitions so row groups are tight too. */
  def writeZOrdered(df: DataFrame, latCol: String, lonCol: String,
                    path: String, numFiles: Int = 8): Unit =
    df.withColumn("_z", zValue(col(latCol), col(lonCol)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
