package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotLog

/** CONCURRENT lifecycle fuzz — the multi-writer counterpart of
  * SnapshotModelSpec (which interleaves verbs in ONE thread): two
  * writer threads run seeded random verb sequences (blind appends,
  * key-disjoint mergeOrRebase upserts+deletes, MoR mergeDv behind the
  * same rebase discipline) against ONE table at the same time, racing
  * real commits through the rename adjudication and the optimistic
  * rebase path — not a staged two-step race like the example specs.
  * Each thread tracks its own expected key→payload map over its OWN
  * disjoint key range, so any serialization of the interleaved commits
  * must converge to the union.
  *
  * After the quiesce (both threads joined):
  *   1. read(latest) == union of the two thread models — no
  *      interleaving may lose, duplicate, or cross-apply a write;
  *   2. the version chain is CONTIGUOUS 0..latest (every rename that
  *      won produced exactly one live manifest; losers retried onto
  *      new numbers, never overwrote);
  *   3. a retention gc reclaims every orphan the losing attempts left
  *      (their segments/tombstones are unreferenced by construction)
  *      and the post-gc read is unchanged;
  *   4. a shallow clone taken at latest mid-run reads a CONSISTENT
  *      committed snapshot (== the source read at the clone's pinned
  *      version, taken after quiesce — commits are atomic or absent).
  *
  * mergeOrRebase gets a deep retry budget: with two writers ping-
  * ponging, a merge can lose several races before its disjointness
  * proof lands. compact/gc stay OUT of the concurrent phase — the
  * single-maintainer discipline every lakehouse documents — and run at
  * the quiesce instead. */
class ConcurrentFuzzSpec extends AnyFunSuite {
  import TestSession._

  private def tmpDir(name: String): String = {
    val d = new java.io.File(s"target/tmp-concfuzz/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getParentFile.mkdirs()
    d.getAbsolutePath
  }

  for (seed <- Seq(11, 42, 20260816))
  test(s"two racing writers (seed $seed): serializable convergence, contiguous history, gc sweeps loser orphans") {
    import spark.implicits._
    val path = tmpDir(s"race$seed")
    val steps = sys.env.getOrElse("SNAP_CONC_STEPS", "8").toInt

    def toDf(rows: Seq[(Long, String, Boolean)]) =
      rows.toDF("k", "p", "del")

    // v0/v1 seed the two ranges as KEY-DISJOINT segments — one fused
    // seed segment would span both writers' ranges and every COW/MoR
    // merge would "touch" the other writer's keys, turning legitimate
    // disjoint-range rebases into refusals
    SnapshotLog.create(spark,
      (0L until 20L).map(k => (k, s"v0_$k")).toDF("k", "p"), path, "k")
    SnapshotLog.append(spark,
      (1000L until 1020L).map(k => (k, s"v0_$k")).toDF("k", "p"),
      path, "k")

    class Writer(val lo: Long, tag: String, seedW: Int)
        extends Thread {
      val rnd = new scala.util.Random(seedW)
      var model: Map[Long, String] =
        (lo until lo + 20L).map(k => k -> s"v0_$k").toMap
      var appended = 0
      @volatile var failure: Option[Throwable] = None
      override def run(): Unit = try {
        for (step <- 1 to steps) {
          rnd.nextInt(3) match {
            case 0 => // blind append of strictly-new keys (auto-rebase)
              val base = lo + 100L + appended * 10L
              val rows = (0 until 1 + rnd.nextInt(3))
                .map(i => (base + i) -> s"${tag}a${step}_$i")
              appended += 1
              SnapshotLog.append(spark,
                rows.toDF("k", "p"), path, "k", maxRetries = 30)
              model ++= rows
            case arm => // COW or MoR merge over this writer's range
              val ups = (0 until 1 + rnd.nextInt(4)).map { _ =>
                val k = lo + rnd.nextLong(60L)
                (k, s"${tag}m${step}_$k", false)
              }.distinct.groupBy(_._1).map(_._2.head).toSeq
              val dels = (0 until rnd.nextInt(3))
                .map(_ => lo + rnd.nextLong(60L)).distinct
                .filterNot(ups.map(_._1).contains)
                .filter(model.contains)
                .map(k => (k, "", true))
              if (ups.nonEmpty || dels.nonEmpty) {
                val df = toDf(ups ++ dels)
                // both merge flavors ride the optimistic rebase loop;
                // ranges are disjoint by construction, so every lost
                // race must rebase — a refusal here is a conflict-check
                // false positive and fails the writer
                if (arm == 1)
                  SnapshotLog.mergeOrRebase(spark, df, path, "k", "del",
                    maxRebases = 30)
                else
                  SnapshotLog.mergeDvOrRebase(spark, df, path, "k", "del",
                    maxRebases = 30)
                model = model -- dels.map(_._1) ++ ups.map(u => u._1 -> u._2)
              }
          }
        }
      } catch { case t: Throwable => failure = Some(t) }
    }

    val a = new Writer(0L, "A", seed)
    val b = new Writer(1000L, "B", seed + 7)
    a.start(); b.start()

    // mid-run shallow clone at whatever is latest RIGHT NOW: commits
    // are atomic, so the clone must read a consistent snapshot
    Thread.sleep(1500)
    val cloneDst = tmpDir(s"race${seed}_clone")
    // fix the source version explicitly: commits may land between the
    // read and the clone, and the comparison below needs the number
    val cloneV = SnapshotLog.latestVersion(path).get
    SnapshotLog.cloneTable(spark, path, cloneDst, Some(cloneV))

    a.join(); b.join()
    a.failure.foreach(t => fail(s"writer A died: ${t.getMessage}", t))
    b.failure.foreach(t => fail(s"writer B died: ${t.getMessage}", t))

    def readMap(p: String, v: Option[Int] = None): Map[Long, String] =
      SnapshotLog.read(spark, p, v).collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("p"))).toMap

    // 1. serializable convergence
    val expect = a.model ++ b.model
    val got = readMap(path)
    assert(got == expect,
      s"diverged (missing=${(expect.keySet -- got.keySet).take(5)}, " +
        s"extra=${(got.keySet -- expect.keySet).take(5)})")

    // 2. contiguous version chain
    val latest = SnapshotLog.latestVersion(path).get
    (0 to latest).foreach(v =>
      assert(SnapshotLog.manifestExists(path, v), s"hole at v$v"))

    // 4. the mid-run clone is a consistent committed snapshot
    assert(readMap(cloneDst) == readMap(path, Some(cloneV)),
      "mid-run clone does not match its pinned source version")

    // 3. quiesce maintenance: compact folds the churn, gc sweeps every
    // losing attempt's orphaned segments and tombstones; state intact
    SnapshotLog.compact(spark, path, "k", Long.MaxValue, slices = 2)
    SnapshotLog.unpin(path, cloneV) // release the clone's pin first
    SnapshotLog.gc(spark, path, retainLast = 1)
    assert(readMap(path) == expect, "state changed across compact+gc")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val live = SnapshotLog.manifest(spark, path,
      SnapshotLog.latestVersion(path).get).collect()
      .map(r => new java.io.File(r.getAs[String]("seg")).getName).toSet
    val onDisk = Option(new java.io.File(s"$path/data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet
    assert(onDisk == live,
      s"gc left loser orphans: ${(onDisk -- live).take(5)}")
    val dvDisk = new java.io.File(s"$path/dv")
    assert(!dvDisk.exists() || dvDisk.listFiles().isEmpty,
      "gc left orphaned tombstone dirs after the purging compact")
  }
}
