package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotLog

/** Point-lookup data skipping past min/max: [[SnapshotLog.compact]] /
  * [[SnapshotLog.compactZOrder]] record a per-segment key-bloom
  * sidecar, and [[SnapshotLog.readPoint]] consults range stats then
  * blooms before scheduling any scan. The contract under test — a
  * missing bloom means "scan it" (never wrong), a bloom prunes
  * range-surviving segments that cannot hold the key, deletion
  * vectors compose (a tombstoned key may pass the bloom and the anti
  * join removes it), and gc reclaims sidecars no surviving manifest
  * references while keeping referenced ones. */
class BloomSkipSpec extends AnyFunSuite {
  import TestSession._

  private def tmpDir(name: String): String = {
    val d = new java.io.File(s"target/tmp-bloom/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getParentFile.mkdirs()
    d.getAbsolutePath
  }

  private def bloomOf(r: org.apache.spark.sql.Row): Option[String] =
    if (!r.schema.fieldNames.contains("bloom") ||
      r.isNullAt(r.fieldIndex("bloom"))) None
    else Option(r.getString(r.fieldIndex("bloom")))

  test("z-order tiles overlap on the key axis; blooms prune the range survivors a point lookup would otherwise scan") {
    import spark.implicits._
    val path = tmpDir("zpoint")
    val df = (0L until 4096L).map(i => (i, (i * 2654435761L) % 4096L))
      .toDF("k", "y")
    SnapshotLog.create(spark, df.filter(col("k") % 2 === 0), path, "k")
    SnapshotLog.append(spark, df.filter(col("k") % 2 === 1), path, "k")
    SnapshotLog.compactZOrder(spark, path, "k", "y", slices = 8)
    val m = SnapshotLog.manifest(spark, path, 2).collect()
    assert(m.forall(bloomOf(_).nonEmpty), "a z-order tile has no bloom")

    // z tiles are 2-D: several tiles' key ranges contain any given key
    val k0 = 1234L
    val rangeHits = m.count(r => r.getAs[Long]("min_key") <= k0 &&
      r.getAs[Long]("max_key") >= k0)
    assert(rangeHits > 1,
      s"fixture broken: only $rangeHits tiles range-hit k=$k0 — " +
        "min/max alone would already answer this lookup")
    val (rows, scanned, total) = SnapshotLog.readPoint(spark, path, "k", k0)
    assert(rows.collect().map(_.getAs[Long]("k")).toSeq == Seq(k0))
    assert(total == m.length)
    assert(scanned < rangeHits,
      s"blooms pruned nothing: scanned $scanned of $rangeHits " +
        "range-surviving tiles")

    // an absent key: every bloom should exclude it (deterministic for
    // this fixture's bits) and the read scans nothing
    val (miss, scannedMiss, _) =
      SnapshotLog.readPoint(spark, path, "k", 999999L)
    assert(miss.count() == 0 && scannedMiss == 0)
  }

  test("missing bloom means scan; compacted segments skip foreign keys; tombstoned keys pass the bloom and die in the anti join") {
    import spark.implicits._
    val path = tmpDir("mixed")
    def rows(keys: Seq[Long]) = keys.map(k => (k, s"p$k")).toDF("k", "p")
    SnapshotLog.create(spark, rows(0L until 1000L), path, "k")
    SnapshotLog.append(spark, rows(1000L until 2000L), path, "k")
    SnapshotLog.compact(spark, path, "k") // v2: one segment WITH a bloom
    // a later append has no bloom but fully overlaps the key range
    SnapshotLog.append(spark, rows(Seq(500000L)), path, "k") // v3
    val m = SnapshotLog.manifest(spark, path, 3).collect()
    assert(m.count(bloomOf(_).nonEmpty) == 1 && m.length == 2)

    // the appended segment's range is a point, so a lookup of a
    // compacted key range-prunes it and bloom-scans the compacted one
    val (r1, s1, t1) = SnapshotLog.readPoint(spark, path, "k", 700L)
    assert(r1.collect().map(_.getAs[String]("p")).toSeq == Seq("p700"))
    assert(s1 == 1 && t1 == 2)
    // the appended key range-hits ONLY its own (bloom-less) segment —
    // the compacted bloom excludes it — and missing-bloom means scan
    val (r2, s2, _) = SnapshotLog.readPoint(spark, path, "k", 500000L)
    assert(r2.collect().map(_.getAs[String]("p")).toSeq == Seq("p500000"))
    assert(s2 == 1, s"scanned $s2 — the compacted bloom failed to " +
      "exclude a key it never held")

    // deletion vectors compose: tombstone a compacted key; the bloom
    // still passes (it indexes physical rows) and the anti join wins
    val del = Seq((700L, "", true)).toDF("k", "p", "del")
    SnapshotLog.mergeDv(spark, del, path, "k", "del") // v4
    val (r3, s3, _) = SnapshotLog.readPoint(spark, path, "k", 700L)
    assert(r3.count() == 0 && s3 >= 1)
    // time travel still sees it
    val (r4, _, _) = SnapshotLog.readPoint(spark, path, "k", 700L, Some(3))
    assert(r4.count() == 1)
  }

  test("readPoints: one manifest pass and one scan for an id list; the candidate set is the union of per-key survivors") {
    import spark.implicits._
    val path = tmpDir("batch")
    val df = (0L until 4096L).map(i => (i, (i * 2654435761L) % 4096L))
      .toDF("k", "y")
    SnapshotLog.create(spark, df.filter(col("k") % 2 === 0), path, "k")
    SnapshotLog.append(spark, df.filter(col("k") % 2 === 1), path, "k")
    SnapshotLog.compactZOrder(spark, path, "k", "y", slices = 8)
    val m = SnapshotLog.manifest(spark, path, 2).collect()

    val keys = Seq(5L, 1234L, 4000L, 999999L) // three live + one absent
    val (rows, scanned, total) =
      SnapshotLog.readPoints(spark, path, "k", keys)
    assert(rows.collect().map(_.getAs[Long]("k")).sorted.toSeq ==
      Seq(5L, 1234L, 4000L))
    assert(total == m.length)
    // the batch's candidates can never exceed the sum of the per-key
    // lookups' — and with blooms it stays well under the range union
    val perKey = keys.map(k =>
      SnapshotLog.readPoint(spark, path, "k", k)._2).sum
    assert(scanned <= perKey && scanned <= m.length)
    val rangeUnion = m.count(r => keys.exists(k =>
      r.getAs[Long]("min_key") <= k && r.getAs[Long]("max_key") >= k))
    assert(scanned < rangeUnion,
      s"blooms pruned nothing for the batch: $scanned of $rangeUnion")
  }

  test("gc sweeps bloom sidecars no surviving manifest references and keeps live ones") {
    import spark.implicits._
    val path = tmpDir("gc")
    def rows(keys: Seq[Long]) = keys.map(k => (k, s"p$k")).toDF("k", "p")
    SnapshotLog.create(spark, rows(0L until 100L), path, "k")
    SnapshotLog.append(spark, rows(100L until 200L), path, "k")
    SnapshotLog.compact(spark, path, "k") // v2: bloom #1
    SnapshotLog.append(spark, rows(200L until 300L), path, "k") // v3
    SnapshotLog.compact(spark, path, "k") // v4: bloom #2; #1 unreferenced
    val live = SnapshotLog.manifest(spark, path, 4).collect()
      .flatMap(bloomOf).toSet
    assert(live.size == 1)
    SnapshotLog.gc(spark, path, retainLast = 1)
    val onDisk = Option(new java.io.File(s"$path/bloom").listFiles())
      .getOrElse(Array.empty)
      .filterNot(_.getName.startsWith(".")) // local-FS .crc twins
      .map(_.getAbsolutePath).toSet
    assert(onDisk == live.map(new java.io.File(_).getAbsolutePath),
      s"gc bloom sweep wrong: disk=$onDisk live=$live")
    // the surviving bloom still prunes
    val (r, s, t) = SnapshotLog.readPoint(spark, path, "k", 42L)
    assert(r.count() == 1 && s == 1 && t == 1)
  }
}
