package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SnapshotLog

/** MODEL-BASED LIFECYCLE FUZZ for the versioned table: a seeded random
  * sequence of every lifecycle verb (append / upsert / merge-with-
  * deletes / sliced compact / Morton-curve compactZOrder / restore /
  * pin / shallow clone / gc / column rename+drop) runs against BOTH the real SnapshotLog
  * table and a trivial in-memory model (a Map plus a version→snapshot
  * history). After every step the suite asserts the invariants the
  * format sells:
  *
  *   1. read(latest) == the model's current state — no verb, in any
  *      order, may lose/duplicate/corrupt a row;
  *   2. TIME TRAVEL: every still-on-disk version reads byte-equal to
  *      the snapshot the model recorded when that version committed —
  *      immutability survives arbitrary later history (including
  *      compactions that rewrite the physical layout and GCs that
  *      delete sibling versions);
  *   3. manifest/data agreement: per-version manifest row counts sum
  *      to the data's count, segment [min,max] stats bound the
  *      segment's actual keys, and — when a z-order rewrite left
  *      second-column stats (which [[SnapshotLog.merge]] carries on
  *      by-reference segments) — those bound the y column too (the
  *      stats-pruning contract readRange/readBox/merge COW all trust);
  *   4. a CHANGE-FEED FOLLOWER consumer riding along — bootstrapped
  *      from v0, fed ONLY by followDiff deliveries (restores arrive as
  *      inverse diffs; rewrite-only compactions are skipped) — tracks
  *      the model through every verb in any order;
  *   5. a SHALLOW CLONE taken at a random surviving version reads
  *      byte-equal to that version's snapshot, diverges under its own
  *      writes, and never disturbs the source;
  *   6. SCHEMA interleaving (verb twelve): the payload column is
  *      randomly RENAMED (metadata-only) and a disposable column
  *      DROPPED mid-history — every later verb speaks the current
  *      logical schema, every time travel reads under ITS version's
  *      schema, restores revert the schema with the rows, and clones
  *      carry the mapping of the version they cut.
  *
  * Individual verbs each have example-based specs (SourcesSpec); this
  * spec checks that they COMPOSE — the class of bug a fixed example
  * can't catch (e.g. compact after a delete-everything merge, gc with
  * a pin on a restored version, a merge carrying 2-D stats over a
  * z-ordered layout that a later 1-D compact rebuilds). Deterministic
  * seed: failures reproduce exactly. */
class SnapshotModelSpec extends AnyFunSuite {
  import TestSession._

  private def tmpDir(name: String): String = {
    val d = new java.io.File(s"target/tmp-snapmodel/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getParentFile.mkdirs()
    d.getAbsolutePath
  }

  private def yOf(k: Long): Long = k % 97L

  for (seed <- Seq(42, 7, 20260815))
  test(s"random lifecycle sequences (seed $seed): table == model at latest, time travel intact, stats bound data") {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val path = tmpDir(s"fuzz$seed")
    val keySpace = 400L

    // invariant 6 state: the logical schema the table currently speaks
    // (pName = payload column's logical name; wLive = the disposable
    // column `w` not yet dropped), plus its per-version history
    var pName = "p"
    var wLive = true
    def wOf(k: Long): Long = k % 13L

    def toDf(rows: Seq[(Long, String)]) =
      if (wLive)
        rows.map { case (k, p) => (k, yOf(k), p, wOf(k)) }
          .toDF("k", "y", pName, "w")
      else rows.map { case (k, p) => (k, yOf(k), p) }.toDF("k", "y", pName)

    var model = (0L until 40L).map(k => k -> s"v0_$k").toMap
    SnapshotLog.create(spark, toDf(model.toSeq), path, "k")
    // version -> model snapshot at that commit
    var hist = Map(0 -> model)
    var histSchema = Map(0 -> ("p", true))
    var latest = 0

    // invariant 4 state: the follower consumer
    var followerState = model

    def commitSnap(v: Int): Unit = {
      hist += (v -> model); histSchema += (v -> (pName, wLive)); latest = v
    }

    def randomRows(n: Int, tag: String): Seq[(Long, String)] =
      (0 until n).map { _ =>
        val k = rnd.nextLong(keySpace)
        k -> s"${tag}_${k}_${rnd.nextInt(1000)}"
      }.distinct.groupBy(_._1).map(_._2.head).toSeq

    def readMap(v: Option[Int] = None): Map[Long, String] = {
      val (pn, wl) = histSchema.getOrElse(v.getOrElse(latest),
        (pName, wLive))
      // mergeSchema: after a field-id re-add the fresh physical lives
      // only in newer segments — reconcile footers everywhere
      val df = SnapshotLog.read(spark, path, v, mergeSchema = true)
      // invariant 6: the version reads under ITS OWN logical schema
      assert(df.columns.contains(pn) && df.columns.contains("w") == wl &&
        !df.columns.exists(c => c != pn && c != "k" && c != "y" && c != "w"),
        s"v$v schema ${df.columns.toSeq} disagrees with recorded ($pn, w=$wl)")
      df.collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String](pn))).toMap
    }

    // depth is env-tunable so a bug hunt can run long sequences
    // (SNAP_FUZZ_STEPS=200) without changing the committed default
    val steps = sys.env.getOrElse("SNAP_FUZZ_STEPS", "40").toInt
    for (step <- 1 to steps) {
      rnd.nextInt(12) match {
        case 0 => // append strictly-new keys
          val base = keySpace + step * 100L
          val rows = (0 until 1 + rnd.nextInt(5))
            .map(i => (base + i) -> s"app${step}_$i")
          val v = SnapshotLog.append(spark, toDf(rows), path, "k")
          model ++= rows; commitSnap(v)
        case 1 => // upsert (replace-or-insert)
          val rows = randomRows(1 + rnd.nextInt(8), s"ups$step")
          val v = SnapshotLog.upsert(spark, toDf(rows), path, "k")
          model ++= rows; commitSnap(v)
        case 2 => // merge: deletes + upserts in one commit
          val ups = randomRows(1 + rnd.nextInt(5), s"mrg$step")
          val delKeys = (0 until 1 + rnd.nextInt(6))
            .map(_ => rnd.nextLong(keySpace)).distinct
            .filterNot(ups.map(_._1).contains)
          val df =
            if (wLive) (ups.map { case (k, p) =>
              (k, yOf(k), p, wOf(k), false) } ++
              delKeys.map(k => (k, yOf(k), "", wOf(k), true)))
              .toDF("k", "y", pName, "w", "del")
            else (ups.map { case (k, p) => (k, yOf(k), p, false) } ++
              delKeys.map(k => (k, yOf(k), "", true)))
              .toDF("k", "y", pName, "del")
          val v = SnapshotLog.merge(spark, df, path, "k", "del")
          model = model -- delKeys ++ ups; commitSnap(v)
        case 3 => // OPTIMIZE, sometimes sliced; rewrite-only: no model change
          val v = SnapshotLog.compact(spark, path, "k",
            minRows = Long.MaxValue, slices = 1 + rnd.nextInt(4))
          if (v != latest) commitSnap(v)
        case 4 => // OPTIMIZE ZORDER on (k, y): the stats map appears
          val v = SnapshotLog.compactZOrder(spark, path, "k", "y",
            slices = 1 + rnd.nextInt(4))
          if (v != latest) commitSnap(v)
        case 5 => // restore a random surviving version
          val survivors = hist.keys.filter(
            SnapshotLog.manifestExists(path, _)).toSeq.sorted
          val target = survivors(rnd.nextInt(survivors.length))
          val v = SnapshotLog.restore(spark, path, target)
          if (v != latest) {
            model = hist(target)
            // restore restores the SCHEMA with the rows
            val (pn, wl) = histSchema(target)
            pName = pn; wLive = wl
            commitSnap(v)
          }
        case 6 => // pin a random surviving version
          val survivors = hist.keys.filter(
            SnapshotLog.manifestExists(path, _)).toSeq.sorted
          SnapshotLog.pin(path, survivors(rnd.nextInt(survivors.length)))
        case 7 => // retention gc: drop expired versions from our record
          val retain = 1 + rnd.nextInt(4)
          SnapshotLog.gc(spark, path, retainLast = retain)
          hist = hist.filter { case (v, _) =>
            SnapshotLog.manifestExists(path, v) }
        case 8 => // invariant 5: shallow clone at a surviving version
          val survivors = hist.keys.filter(
            SnapshotLog.manifestExists(path, _)).toSeq.sorted
          val target = survivors(rnd.nextInt(survivors.length))
          val dst = tmpDir(s"fuzz${seed}_clone$step")
          SnapshotLog.cloneTable(spark, path, dst, Some(target))
          // the clone carries the mapping of the version it cut
          val (cpn, cwl) = histSchema(target)
          val cloneMap = SnapshotLog.read(spark, dst).collect()
            .map(r => (r.getAs[Long]("k"), r.getAs[String](cpn))).toMap
          assert(cloneMap == hist(target),
            s"step $step: clone of v$target diverged from its snapshot")
          // the clone's own writes never reach the source (and speak
          // the CLONE's logical schema, not the source's current one)
          val cdf =
            if (cwl) Seq((1L, yOf(1L), s"clone$step", wOf(1L)))
              .toDF("k", "y", cpn, "w")
            else Seq((1L, yOf(1L), s"clone$step")).toDF("k", "y", cpn)
          SnapshotLog.upsert(spark, cdf, dst, "k")
          assert(readMap() == model,
            s"step $step: a clone write leaked into the source")
        case 9 => // MERGE-ON-READ merge: deletes+upserts via deletion
          // vectors — same model semantics as case 2, different physics
          val ups = randomRows(1 + rnd.nextInt(5), s"mor$step")
          val delKeys = (0 until 1 + rnd.nextInt(6))
            .map(_ => rnd.nextLong(keySpace)).distinct
            .filterNot(ups.map(_._1).contains)
          val df =
            if (wLive) (ups.map { case (k, p) =>
              (k, yOf(k), p, wOf(k), false) } ++
              delKeys.map(k => (k, yOf(k), "", wOf(k), true)))
              .toDF("k", "y", pName, "w", "del")
            else (ups.map { case (k, p) => (k, yOf(k), p, false) } ++
              delKeys.map(k => (k, yOf(k), "", true)))
              .toDF("k", "y", pName, "del")
          val v = SnapshotLog.mergeDv(spark, df, path, "k", "del")
          model = model -- delKeys ++ ups; commitSnap(v)
        case 10 => // targeted tombstone purge at a random density
          // threshold; rewrite-only: no model change
          val v = SnapshotLog.purgeDv(spark, path, "k",
            minDvFrac = rnd.nextDouble() * 0.5)
          if (v != latest) commitSnap(v)
        case 11 => // invariant 6: schema evolution mid-history —
          // metadata-only rename of the payload column, the drop of
          // the disposable column, or (r18) its FIELD-ID RE-ADD: an
          // upsert speaking `w` again after a drop allocates a fresh
          // physical (w__f<n>), so drop/re-add cycles interleave with
          // every other verb
          if (wLive && rnd.nextBoolean()) {
            val v = SnapshotLog.dropColumn(spark, path, "w")
            wLive = false; commitSnap(v)
          } else if (!wLive && rnd.nextBoolean()) {
            val rows = randomRows(1 + rnd.nextInt(4), s"readd$step")
            wLive = true // toDf speaks w again from here on
            val v = SnapshotLog.upsert(spark, toDf(rows), path, "k")
            model ++= rows; commitSnap(v)
          } else {
            val next = s"p$step"
            val v = SnapshotLog.renameColumn(spark, path, pName, next)
            pName = next; commitSnap(v)
          }
      }

      // invariant 1: latest == model
      val got = readMap()
      assert(got == model, s"step $step: latest diverged from model " +
        s"(missing=${(model.keySet -- got.keySet).take(5)}, " +
        s"extra=${(got.keySet -- model.keySet).take(5)})")

      // invariant 2: every surviving version time-travels byte-equal
      // to its recorded snapshot (check 2 random survivors per step)
      val survivors = hist.keys.toSeq.sorted
      (0 until 2).foreach { _ =>
        val v = survivors(rnd.nextInt(survivors.length))
        assert(readMap(Some(v)) == hist(v),
          s"step $step: time travel to v$v diverged from its snapshot")
      }

      // invariant 4: the follower consumer converges to the model on
      // every poll — deletes remove, inserts/updates take _new, and a
      // skipped rewrite-only compaction must not desync it
      SnapshotLog.followDiff(spark, path, "k", "fz") { (feed, _) =>
        feed.select(col("k"), col("change"), col(s"_new.$pName").as("p"))
          .collect().foreach { r =>
            if (r.getString(1) == "delete")
              followerState -= r.getLong(0)
            else followerState += (r.getLong(0) -> r.getString(2))
          }
        ()
      }
      assert(followerState == model,
        s"step $step: follower-fed state diverged from the model")

      // invariant 3: manifest stats agree with and bound the data —
      // including the second-column stats a z-order rewrite leaves and
      // merge carries on by-reference segments
      val m = SnapshotLog.manifest(spark, path, latest).collect()
      def dvRows(r: org.apache.spark.sql.Row): Long =
        if (!r.schema.fieldNames.contains("dv_rows") ||
          r.isNullAt(r.fieldIndex("dv_rows"))) 0L
        else r.getLong(r.fieldIndex("dv_rows"))
      // LOGICAL rows: physical minus deletion-vector-suppressed
      assert(m.map(r => r.getAs[Long]("n_rows") - dvRows(r)).sum
        == model.size,
        s"step $step: manifest row counts disagree with the data")
      val hasStats = m.nonEmpty && m.head.schema.fieldNames.contains("stats")
      m.foreach { r =>
        val seg = r.getAs[String]("seg")
        val rows = spark.read.parquet(seg).select(col("k"), col("y"))
          .collect().map(x => (x.getLong(0), x.getLong(1)))
        assert(rows.nonEmpty &&
          rows.map(_._1).min == r.getAs[Long]("min_key") &&
          rows.map(_._1).max == r.getAs[Long]("max_key"),
          s"step $step: stats of $seg do not bound its keys")
        // the per-column stats map: EVERY entry must bound its column
        // exactly (z-order writes y; merge carries the map by reference)
        if (hasStats && !r.isNullAt(r.fieldIndex("stats"))) {
          val byCol = Map("k" -> rows.map(_._1), "y" -> rows.map(_._2))
          r.getMap[String, org.apache.spark.sql.Row](r.fieldIndex("stats"))
            .foreach { case (c, mm) =>
              val vals = byCol.getOrElse(c,
                fail(s"step $step: stats entry for unknown column $c"))
              assert(vals.min == mm.getLong(0) && vals.max == mm.getLong(1),
                s"step $step: stats[$c] of $seg do not bound the column")
            }
        }
      }
    }
    // end state sanity: the table survived the mixed lifecycle steps
    assert(SnapshotLog.history(spark, path).count() == hist.size)
  }
}
