package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventRow, EventStreams}

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  import TestSession._

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  private val sample = Seq(
    Ev(1, t(0), 1, "click", 1.0), Ev(2, t(5), 1, "click", 2.0),
    Ev(3, t(50), 1, "click", 3.0), // > 30 min gap -> new session
    Ev(4, t(0), 2, "view", 4.0), Ev(5, t(65), 2, "view", 5.0),
    Ev(6, t(2), 1, "click", 6.0)) // same user/type/hour as 1 -> dedup drop

  private def runStream(transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        mode: String): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(sample: _*)
    val q = transform(mem.toDF())
      .writeStream.format("memory").queryName("out_" + mode.replace(" ", ""))
      .outputMode(mode).start()
    q.processAllAvailable(); q.stop()
    spark.table("out_" + mode.replace(" ", "")).collect()
  }

  test("late audit: planted stragglers flagged, two-level equals global, frac exact") {
    import spark.implicits._
    // arrival order = event_id; event 4 arrives 40 min behind the
    // running max (t(60)) -> late under delay 30; event 5 is only
    // 10 min behind -> on time; the leading events can never be late
    val evs = Seq(
      Ev(1, t(0), 1, "click", 1.0), Ev(2, t(60), 1, "click", 1.0),
      Ev(3, t(70), 1, "click", 1.0), Ev(4, t(20), 1, "click", 1.0),
      Ev(5, t(61), 1, "click", 1.0), Ev(6, t(80), 1, "view", 1.0))
    val got = EventStreams.lateAuditOf(evs.toDF(), delayMin = 30)
      .orderBy("window_start", "event_type").collect()
    // first hour: events 1 and 4 -> one late; second hour: all on time
    assert(got.map(_.getLong(3)).sum == 1L, "exactly one late event")
    val lateRow = got.find(_.getLong(3) == 1L).get
    assert(lateRow.getTimestamp(0).getTime == (t(0).getTime / 3600000L)
      * 3600000L, "the late event lands in the first hour window")
    assert(lateRow.getDouble(4) ==
      math.floor(1.0 / lateRow.getLong(2) * 1e4 + 0.5) / 1e4)
    // the two-level decomposition is chunk-size invariant: a tiny chunk
    // (forcing cross-chunk prefix reads) equals one big chunk (pure
    // in-partition window) row for row
    val small = EventStreams.lateAuditOf(evs.toDF(), 30, chunkSize = 2)
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    val big = EventStreams.lateAuditOf(evs.toDF(), 30, chunkSize = 1 << 20)
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    assert(small == big && small == got.map(_.toSeq).toSeq)
    // and over the real events table the audit is non-degenerate: both
    // on-time mass and SOME late mass exist at the default delay
    val real = EventStreams.lateAuditBatch(spark, sf).collect()
    assert(real.map(_.getLong(2)).sum > real.map(_.getLong(3)).sum)
    assert(real.map(_.getLong(3)).sum > 0L)
  }

  test("windowed agg: batch and streaming agree on MemoryStream input") {
    import spark.implicits._
    val batch = EventStreams.windowAgg(sample.toDF())
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    val stream = runStream(EventStreams.windowAggStream, "complete")
    val streamSorted = stream.map(_.toSeq).sortBy(r =>
      (r(0).asInstanceOf[Timestamp].getTime, r(1).asInstanceOf[String]))
    assert(batch == streamSorted.toSeq)
  }

  test("sessionize splits on gap >= 30 minutes") {
    import spark.implicits._
    val rows = EventStreams.sessionize(sample.toDF())
      .orderBy("user_id", "first_ts").collect()
    // user 1: events at 0,2,5 then 50 -> two sessions; user 2: 0 and 65 -> two
    val u1 = rows.filter(_.getLong(0) == 1)
    assert(u1.length == 2 && u1(0).getLong(3) == 3 && u1(1).getLong(3) == 1)
    assert(rows.count(_.getLong(0) == 2) == 2)
  }

  test("sessionize runs as a real stream") {
    val rows = runStream(EventStreams.sessionizeStream, "complete")
    assert(rows.length == 4)
  }

  test("view maintenance stream: SnapshotLog state converges to the batch view, one version per batch") {
    import spark.implicits._
    import graft.sources.SnapshotLog
    implicit val sqlCtx = spark.sqlContext
    val path = {
      val d = new java.io.File("target/tmp-streams/view_maintain")
      org.apache.commons.io.FileUtils.deleteQuietly(d)
      d.getParentFile.mkdirs()
      d.getAbsolutePath
    }
    // enough spread that batches genuinely overlap groups: 3 hours x
    // 3 types, values carrying fractional mass
    val evs = (0 until 180).map(i =>
      Ev(i.toLong, t(i), i % 20,
        Seq("click", "view", "purchase")(i % 3), i * 0.25 + 0.01))
    val mem = MemoryStream[Ev]
    val q = EventStreams.viewMaintainStream(mem.toDF(), path)
    // three micro-batches split by event id — each must commit exactly
    // one new version
    evs.grouped(60).foreach { b =>
      mem.addData(b: _*)
      q.processAllAvailable()
    }
    q.stop()
    assert(SnapshotLog.latestVersion(path).contains(2),
      "three non-empty batches -> versions 0, 1, 2")
    // CONVERGENCE: the maintained state equals the batch full
    // recompute row for row (counts exact; sums differ only below the
    // presentation rounding)
    val got = EventStreams.viewMaintainRead(spark, path)
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    val want = EventStreams.viewMaintain(evs.toDF())
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    assert(got == want, "stream state must equal the batch view")
    // intermediate versions are the prefix views: version 0 equals the
    // recompute over batch 1 alone (the refresh history is honest)
    val v0 = EventStreams.viewMaintainRead(spark, path, Some(0))
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    val w0 = EventStreams.viewMaintain(evs.take(60).toDF())
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    assert(v0 == w0, "version 0 must be the first batch's view")
  }

  test("sketch window runs inside streaming state and agrees with batch") {
    import spark.implicits._
    // enough cardinality that the sketches actually summarize something:
    // 3 hours x 2 types, many users per window
    val evs = (0 until 300).map(i =>
      Ev(100 + i, t(i), i % 40, if (i % 2 == 0) "click" else "view",
        (i % 17).toDouble))
    val batch = EventStreams.sketchWindow(evs.toDF())
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // two micro-batches: the sketch buffers must merge across batches
    // in the state store, not just within one
    mem.addData(evs.take(150): _*)
    val q = EventStreams.sketchWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("out_sketch")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(evs.drop(150): _*)
    q.processAllAvailable(); q.stop()
    val stream = spark.table("out_sketch").collect().map(_.toSeq)
      .sortBy(r => (r(0).asInstanceOf[Timestamp].getTime,
        r(1).asInstanceOf[String])).toSeq
    assert(batch == stream && batch.nonEmpty)
    // sanity: approx distinct lands near the true per-window cardinality
    EventStreams.sketchWindow(evs.toDF()).collect().foreach { r =>
      assert(r.getLong(2) > 0 && r.getLong(2) <= 40)
      assert(r.getDouble(3) <= r.getDouble(4)) // p50 <= p90
    }
  }

  test("count-min window: streaming state merges across batches, equals batch") {
    import spark.implicits._
    val evs = (0 until 300).map(i =>
      Ev(100 + i, t(i), i % 25, if (i % 2 == 0) "click" else "view",
        (i % 17).toDouble))
    val batch = EventStreams.cmWindow(evs.toDF())
      .orderBy("window_start", "r", "b").collect().map(_.toSeq).toSeq
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs.take(150): _*)
    val q = EventStreams.cmWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("out_cm")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(evs.drop(150): _*)
    q.processAllAvailable(); q.stop()
    val stream = spark.table("out_cm").collect().map(_.toSeq)
      .sortBy(r => (r(0).asInstanceOf[Timestamp].getTime,
        r(1).asInstanceOf[Int], r(2).asInstanceOf[Long])).toSeq
    assert(batch == stream && batch.nonEmpty)
    // the sketch footprint honors its bound: cells per window <= d x w
    val perWin = batch.groupBy(_.head).map(_._2.size)
    assert(perWin.forall(_ <= EventStreams.CmDepth * EventStreams.CmWidth))
  }

  test("sliding window: events land in two windows, streaming equals batch") {
    import spark.implicits._
    val evs = (0 until 300).map(i =>
      Ev(100 + i, t(i), i % 25, if (i % 3 == 0) "click" else "view",
        (i % 17).toDouble))
    val batch = EventStreams.slidingWindow(evs.toDF())
      .orderBy("window_start", "event_type").collect().map(_.toSeq).toSeq
    // each event is counted in exactly len/slide = 2 windows
    assert(batch.map(_(2).asInstanceOf[Long]).sum == 2L * evs.length)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs.take(150): _*)
    val q = EventStreams.slidingWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("out_slide")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(evs.drop(150): _*)
    q.processAllAvailable(); q.stop()
    val stream = spark.table("out_slide").collect().map(_.toSeq)
      .sortBy(r => (r(0).asInstanceOf[Timestamp].getTime,
        r(1).asInstanceOf[String])).toSeq
    assert(batch == stream && batch.nonEmpty)
  }

  test("streaming dedup keeps one row per user/type/hour") {
    import spark.implicits._
    val stream = runStream(EventStreams.dedupStream, "append")
    // sample has 5 distinct (user, type, hour) keys (events 1,2,6 share one)
    assert(stream.length == 4)
    val batch = EventStreams.dedupKeyed(sample.toDF()).collect()
    assert(batch.length == 4)
    // batch keeps the earliest deterministically
    val kept = batch.map(_.getLong(3)).toSet
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(6L))
  }

  test("stateful anomaly detector: streaming equals batch, z-scores verified") {
    import spark.implicits._
    // deterministic series: stable history then a spike
    val evs = (1 to 20).map(i =>
      EventRow(i, t(i), 1, "m", 10.0 + (i % 3))) :+
      EventRow(21, t(21), 1, "m", 500.0)
    val batch = EventStreams.anomalies(evs.toDS()).collect()
    assert(batch.length == 1 && batch.head.event_id == 21)
    assert(batch.head.zscore > EventStreams.ZThreshold)

    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    // two micro-batches: state must carry history across them
    mem.addData(evs.take(12): _*)
    val q = EventStreams.anomalies(mem.toDS()).toDF()
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    q.processAllAvailable()
    mem.addData(evs.drop(12): _*)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("anom").collect()
    assert(streamed.length == 1 && streamed.head.getLong(1) == 21)
    assert(math.abs(streamed.head.getDouble(4) - batch.head.zscore) < 1e-9)
  }

  test("windowed top-k runs as a real stream with heap state, equals batch") {
    import spark.implicits._
    val evs = Seq(Ev(1, t(1), 1, "m", 5.0), Ev(2, t(2), 1, "m", 9.0),
      Ev(3, t(3), 2, "m", 7.0), Ev(4, t(4), 2, "m", 1.0),
      Ev(5, t(65), 1, "m", 4.0))
    val batch = EventStreams.topkPerWindow(evs.toDF())
      .orderBy("window_start", "rk").collect().map(_.toSeq).toSeq
    // first hour keeps top-3 of 4 events (9,7,5), second hour has one
    assert(batch.map(_(2)) == Seq(2L, 3L, 1L, 5L))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // two micro-batches: the heap state must merge across them
    mem.addData(evs.take(2): _*)
    val q = EventStreams.topkPerWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("topkw")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(evs.drop(2): _*)
    q.processAllAvailable(); q.stop()
    val sorted = spark.table("topkw").collect().map(_.toSeq).sortBy(r =>
      (r(0).asInstanceOf[java.sql.Timestamp].getTime, r(1).asInstanceOf[Int]))
    assert(sorted.toSeq == batch)
  }

  test("windowed priority sample streams with heap state, equals batch") {
    import spark.implicits._
    // six events in hour one (> k+1 = 5, so tau engages), two in hour two
    val evs = Seq(Ev(1, t(1), 1, "m", 5.0), Ev(2, t(2), 1, "m", 9.0),
      Ev(3, t(3), 2, "m", 7.0), Ev(4, t(4), 2, "m", 1.0),
      Ev(5, t(10), 1, "m", 4.0), Ev(6, t(20), 2, "m", 8.0),
      Ev(7, t(65), 1, "m", 4.0), Ev(8, t(70), 2, "m", 2.0))
    val batch = EventStreams.sampleWindow(evs.toDF())
      .orderBy("window_start", "rk").collect().map(_.toSeq).toSeq
    // hour one samples exactly k = 4 of its 6 events with tau > 0;
    // hour two samples both its events with tau == 0
    val hours = batch.groupBy(_(0))
    assert(hours.size == 2)
    assert(batch.count(_(4).asInstanceOf[Double] > 0.0) == 4,
      "exactly the full hour-one window carries a live tau")
    assert(batch.count(_(4).asInstanceOf[Double] == 0.0) == 2,
      "the under-full window samples everything at tau 0")
    // in-memory recompute of hour one's heap order
    def pri(id: Long, v: Double): Double =
      v / ((((id % 2147483648L) * 1103515245L + 12345L)
        % 2147483647L + 1L).toDouble / 2147483648.0)
    val h1 = evs.take(6).map(e => (e.event_id, pri(e.event_id, e.value)))
      .sortBy(p => (-p._2, p._1))
    assert(batch.take(4).map(_(2)) == h1.take(4).map(_._1))
    assert(batch.take(4).forall(_(4).asInstanceOf[Double] == h1(4)._2),
      "tau is the (k+1)-th priority")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs.take(3): _*)
    val q = EventStreams.sampleWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("samplew")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(evs.drop(3): _*)
    q.processAllAvailable(); q.stop()
    val sorted = spark.table("samplew").collect().map(_.toSeq).sortBy(r =>
      (r(0).asInstanceOf[java.sql.Timestamp].getTime, r(1).asInstanceOf[Int]))
    assert(sorted.toSeq == batch)
  }

  test("bottom-k window: equals in-memory recompute; stream merges micro-batches to the same sample") {
    import spark.implicits._
    // six events in hour one (> k = 4, so the heap cuts and the KMV
    // estimate engages), two in hour two (under-full: exact count)
    val evs = Seq(Ev(1, t(1), 1, "m", 5.0), Ev(2, t(2), 1, "m", 9.0),
      Ev(3, t(3), 2, "m", 7.0), Ev(4, t(4), 2, "m", 1.0),
      Ev(5, t(10), 1, "m", 4.0), Ev(6, t(20), 2, "m", 8.0),
      Ev(7, t(65), 1, "m", 4.0), Ev(8, t(70), 2, "m", 2.0))
    val batch = EventStreams.bottomkWindow(evs.toDF())
      .orderBy("window_start", "rk").collect().map(_.toSeq).toSeq
    def u(id: Long): Double =
      (((id % 2147483648L) * 1103515245L + 12345L) % 2147483647L + 1L)
        .toDouble / 2147483648.0
    // in-memory recompute per window
    val h1 = evs.take(6).map(e => (u(e.event_id), e.event_id)).sorted
    val h2 = evs.drop(6).map(e => (u(e.event_id), e.event_id)).sorted
    val wantH1 = h1.take(4).zipWithIndex.map { case ((uu, id), i) =>
      (i + 1, id, uu, 3.0 / h1(3)._1, 6L) }
    val wantH2 = h2.zipWithIndex.map { case ((uu, id), i) =>
      (i + 1, id, uu, 2.0, 2L) }
    val got = batch.map(r => (r(1).asInstanceOf[Int], r(2).asInstanceOf[Long],
      r(3).asInstanceOf[Double], r(4).asInstanceOf[Double],
      r(5).asInstanceOf[Long]))
    assert(got.toList == (wantH1 ++ wantH2).toList,
      s"bottom-k recompute mismatch: $got")
    // STREAM: split MID-hour-one so the standing window state must
    // MERGE two micro-batches' bottom-ks — the sketch property live
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs.take(3): _*)
    val q = EventStreams.bottomkWindowStream(mem.toDF())
      .writeStream.format("memory").queryName("bottomkw")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(evs.drop(3): _*)
    q.processAllAvailable(); q.stop()
    val sorted = spark.table("bottomkw").collect().map(_.toSeq).sortBy(r =>
      (r(0).asInstanceOf[java.sql.Timestamp].getTime, r(1).asInstanceOf[Int]))
    assert(sorted.toSeq == batch, "merged stream state != batch bottom-k")
  }

  test("f2 window: equals in-memory recompute; stream merges micro-batch sums exactly") {
    import spark.implicits._
    // hour one: user 1 x3, user 2 x2, user 3 x1 (F2 = 9+4+1 = 14);
    // hour two: user 1 x2 (F2 = 4)
    val evs = Seq(Ev(1, t(1), 1, "m", 0), Ev(2, t(2), 1, "m", 0),
      Ev(3, t(3), 1, "m", 0), Ev(4, t(4), 2, "m", 0),
      Ev(5, t(10), 2, "m", 0), Ev(6, t(20), 3, "m", 0),
      Ev(7, t(65), 1, "m", 0), Ev(8, t(70), 1, "m", 0))
    val batch = EventStreams.f2Window(evs.toDF())
      .orderBy("window_start", "sketch_row").collect().map(_.toSeq).toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sign(id: Long, r: Int): Long =
      1L - 2L * ("0123456789abcdef".indexOf(md5hex(id.toString)(r)) % 2)
    def wantFor(users: Seq[Long]): Seq[(Long, Long, Long)] = {
      val sums = (0 until 9).map(r => users.map(sign(_, r)).sum)
      val med = sums.map(s => s * s).zipWithIndex.sortBy(identity)
        .apply(4)._1
      sums.zipWithIndex.map { case (s, _) => (s, s * s, med) }
    }
    val w1 = wantFor(evs.take(6).map(_.user_id))
    val w2 = wantFor(evs.drop(6).map(_.user_id))
    val got = batch.map(r => (r(2).asInstanceOf[Long],
      r(3).asInstanceOf[Long], r(4).asInstanceOf[Long],
      r(5).asInstanceOf[Long]))
    val want = w1.map { case (s, e, m) => (s, e, m, 6L) } ++
      w2.map { case (s, e, m) => (s, e, m, 2L) }
    assert(got.toList == want.toList, s"f2 recompute mismatch: $got")
    // STREAM: split MID-hour-one so the standing window sums must
    // merge two micro-batches — commutative folds, bit-exact
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(evs.take(3): _*)
    val q = EventStreams.f2WindowStream(mem.toDF())
      .writeStream.format("memory").queryName("f2w")
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(evs.drop(3): _*)
    q.processAllAvailable(); q.stop()
    val sorted = spark.table("f2w").collect().map(_.toSeq).sortBy(r =>
      (r(0).asInstanceOf[java.sql.Timestamp].getTime,
        r(1).asInstanceOf[Int]))
    assert(sorted.toSeq == batch, "merged stream state != batch f2 sketch")
  }

  test("interval join: streaming pairs equal the batch join's pairs") {
    import spark.implicits._
    val purchases = Seq(Ev(10, t(20), 1, "purchase", 9.0),
      Ev(11, t(40), 1, "purchase", 8.0), Ev(12, t(5), 2, "purchase", 7.0))
    val clicks = Seq(Ev(1, t(11), 1, "click", 1.0),  // in window of p10 only
      Ev(2, t(20), 1, "click", 2.0),                  // boundary: equal ts joins
      Ev(3, t(29), 1, "click", 3.0),                  // 11 min before p11: out
      Ev(4, t(31), 1, "click", 4.0),                  // in window of p11
      Ev(5, t(6), 2, "click", 5.0))                   // after p12: out
    val batchPairs = EventStreams
      .recentClicksJoin(purchases.toDF(), clicks.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(batchPairs == Map(10L -> 2L, 11L -> 1L, 12L -> 0L))

    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[Ev]; val cm = MemoryStream[Ev]
    pm.addData(purchases: _*); cm.addData(clicks: _*)
    val q = EventStreams.recentClicksJoinStream(pm.toDF(), cm.toDF())
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ij").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    // inner streaming join emits only matched pairs
    assert(streamed == Map(10L -> 2L, 11L -> 1L))
  }

  test("left-outer interval join: stream emits batch's null rows after " +
    "watermark expiry") {
    import spark.implicits._
    val purchases = Seq(Ev(10, t(20), 1, "purchase", 9.0),
      Ev(11, t(40), 1, "purchase", 8.0), Ev(12, t(5), 2, "purchase", 7.0))
    val clicks = Seq(Ev(1, t(11), 1, "click", 1.0),
      Ev(2, t(20), 1, "click", 2.0), Ev(3, t(29), 1, "click", 3.0),
      Ev(4, t(31), 1, "click", 4.0), Ev(5, t(6), 2, "click", 5.0))
    def pairs(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toSeq.sorted
    // batch: p10 joins clicks 1+2, p11 joins click 4, p12 emits a NULL
    // click row (click 5 is after it)
    val batch = graft.streaming.EventStreams
      .recentClicksOuterStream(purchases.toDF(), clicks.toDF())
    val batchPairs = pairs(
      // the same transform runs as a plain batch plan too
      batch.collect())
    assert(batchPairs == Seq((10L, Some(1.0)), (10L, Some(2.0)),
      (11L, Some(4.0)), (12L, None)))

    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[Ev]; val cm = MemoryStream[Ev]
    pm.addData(purchases: _*); cm.addData(clicks: _*)
    val q = graft.streaming.EventStreams
      .recentClicksOuterStream(pm.toDF(), cm.toDF())
      .writeStream.format("memory").queryName("ijo")
      .outputMode("append").start()
    q.processAllAvailable()
    // null rows cannot exist yet: the watermark hasn't proven absence
    assert(spark.table("ijo").collect().forall(!_.isNullAt(5)))
    // advance both watermarks far past every purchase + lookback: the
    // unmatched purchase must now emit null-padded and expire
    pm.addData(Ev(99, t(600), 9, "purchase", 0.0))
    cm.addData(Ev(98, t(600), 9, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val streamed = pairs(spark.table("ijo")
      .filter(col("event_id") < 90).collect())
    assert(streamed == batchPairs, "stream (incl. null rows) != batch")
  }

  test("full-outer interval join: stream emits BOTH null-row classes after " +
    "watermark expiry, equal to batch") {
    import spark.implicits._
    // user 1: purchase t20 matches clicks t15/t20; click t31 matches NO
    // purchase (none in [31, 41]) -> unmatched-click row. user 2:
    // purchase t5 with no clicks -> unmatched-purchase row.
    val purchases = Seq(Ev(10, t(20), 1, "purchase", 9.0),
      Ev(12, t(5), 2, "purchase", 7.0))
    val clicks = Seq(Ev(1, t(15), 1, "click", 1.0),
      Ev(2, t(20), 1, "click", 2.0), Ev(3, t(31), 1, "click", 3.0))
    def rows(rs: Array[org.apache.spark.sql.Row]) = rs
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toSeq.sorted
    val batch = rows(graft.streaming.EventStreams
      .recentClicksFullStream(purchases.toDF(), clicks.toDF()).collect())
    assert(batch == Seq((-1L, 1L, Some(3.0)), // unmatched click
      (10L, 1L, Some(1.0)), (10L, 1L, Some(2.0)),
      (12L, 2L, None)), s"batch full-outer shape wrong: $batch")
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[Ev]; val cm = MemoryStream[Ev]
    pm.addData(purchases: _*); cm.addData(clicks: _*)
    val q = graft.streaming.EventStreams
      .recentClicksFullStream(pm.toDF(), cm.toDF())
      .writeStream.format("memory").queryName("ijf")
      .outputMode("append").start()
    q.processAllAvailable()
    // neither null class can exist yet: no watermark has proven absence
    assert(spark.table("ijf").collect()
      .forall(r => !r.isNullAt(0) && !r.isNullAt(5)))
    // advance both watermarks far past everything: the unmatched
    // purchase AND the unmatched click must now emit null-padded
    pm.addData(Ev(99, t(600), 9, "purchase", 0.0))
    cm.addData(Ev(98, t(600), 9, "click", 0.0))
    q.processAllAvailable(); q.stop()
    val streamed = rows(spark.table("ijf")
      .filter(col("user_id") < 9).collect())
    assert(streamed == batch,
      "stream (incl. both null classes) != batch")
  }

  test("idempotent parquet sink: batch replay overwrites, never duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = new java.io.File("target/tmp-e2e/idempotent-sink")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    val path = dir.getAbsolutePath
    val mem = MemoryStream[Ev]
    mem.addData(sample.take(3): _*)
    val q = EventStreams.idempotentParquetSink(mem.toDF(), path).start()
    q.processAllAvailable()
    mem.addData(sample.drop(3): _*)
    q.processAllAvailable(); q.stop()
    val out = spark.read.parquet(path)
    assert(out.count() == sample.length)
    // replaying a batch id must overwrite, not append
    sample.take(3).toDF().write.mode("overwrite").parquet(s"$path/batch_id=0")
    assert(spark.read.parquet(path).count() == sample.length)
  }

  test("watched-dir ingest -> enrich -> idempotent sink is exactly-once " +
    "across a restart that replays a batch") {
    val base = java.nio.file.Files.createTempDirectory("e2e-replay").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    def shard(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, user_id LONG, event_type STRING, value DOUBLE")
    import spark.implicits._
    val users = Seq((10L, "BUILDING", "FRANCE"), (11L, "MACHINERY", "KENYA"))
      .toDF("c_custkey", "c_mktsegment", "n_name")
    def start() = {
      val stream = spark.readStream.schema(schema).json(in)
      EventStreams.idempotentParquetSink(
        EventStreams.enrich(stream, users), out)
        .option("checkpointLocation", ckpt).start()
    }
    shard("a.json", Seq(
      """{"event_id":1,"user_id":10,"event_type":"click","value":1.5}""",
      """{"event_id":2,"user_id":11,"event_type":"view","value":2.5}"""))
    val q1 = start()
    q1.processAllAvailable()
    shard("b.json", Seq(
      """{"event_id":3,"user_id":10,"event_type":"purchase","value":9.0}""",
      """{"event_id":4,"user_id":99,"event_type":"click","value":0.5}"""))
    q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    def snapshot() = spark.read.parquet(out)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("segment"), col("nation"), col("batch_id"))
      .collect().map(_.toSeq).sortBy(_.toString)
    val before = snapshot()
    assert(before.length == 4, "both shards enriched and landed")
    // simulate a crash AFTER the sink wrote batch 1 but BEFORE the
    // checkpoint committed it: delete the newest commit marker, so the
    // restarted query REPLAYS that batch from the offsets log
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toInt)
    assert(commits.length >= 2, "expected one commit per micro-batch")
    assert(commits.last.delete())
    // the local checkpoint FS writes .crc sidecars; a stale one makes
    // the replayed commit look like a concurrent writer
    new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc").delete()
    val q2 = start()
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    val after = snapshot()
    // the replayed batch overwrote its own batch_id partition: byte-for
    // -byte identical rows, no duplicates, same batch attribution
    assert(after.length == 4, s"replay duplicated rows: ${after.length}")
    assert(after.toSeq == before.toSeq)
    // left-outer enrich kept the unknown user with null dim columns
    assert(spark.read.parquet(out)
      .filter(col("user_id") === 99 && col("segment").isNull).count() == 1)
  }

  test("batch session count on real events is sane") {
    val df = EventStreams.sessionizeBatch(spark, sf)
    val n = df.count()
    val users = df.select("user_id").distinct().count()
    assert(n >= users, "at least one session per active user")
  }

  test("cdcMerge: last op wins, deleted keys are absent, batch == stream state") {
    import spark.implicits._
    // user 1: upserts then a trailing delete -> absent from state
    // user 2: delete in the middle, upsert after -> present with last value
    // user 3: single upsert
    val log = Seq(
      Ev(1, t(0), 1, "click", 1.0), Ev(2, t(5), 1, "view", 2.0),
      Ev(3, t(9), 1, "error", 0.0),
      Ev(4, t(1), 2, "click", 4.0), Ev(5, t(3), 2, "error", 0.0),
      Ev(6, t(7), 2, "purchase", 6.0),
      Ev(7, t(2), 3, "view", 7.0))
    val batch = EventStreams.cdcMerge(log.toDF()).orderBy("user_id").collect()
    assert(batch.map(_.getLong(0)).toSeq == Seq(2L, 3L))
    assert(batch(0).getDouble(1) == 6.0 && batch(0).getLong(3) == 3)
    assert(batch(1).getDouble(1) == 7.0 && batch(1).getLong(3) == 1)

    // stream in TWO batches split mid-key; final emitted state per key
    // must equal the batch merge (including the tombstone for user 1)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.cdcMergeStream(mem.toDF().as[EventRow])
      .toDF("user_id", "value", "ts", "n_ops", "deleted")
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode("update").start()
    mem.addData(log.take(4): _*); q.processAllAvailable()
    mem.addData(log.drop(4): _*); q.processAllAvailable(); q.stop()
    val last = spark.table("cdc_out").collect()
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> rs.maxBy(_.getLong(3)) } // highest n_ops = latest emission
    assert(last(1L).getBoolean(4), "user 1's final state must be a tombstone")
    assert(!last(2L).getBoolean(4) && last(2L).getDouble(1) == 6.0
      && last(2L).getLong(3) == 3)
    assert(!last(3L).getBoolean(4) && last(3L).getDouble(1) == 7.0)
  }

  test("opStatus: batch rollup matches stream state under out-of-order " +
    "multi-batch delivery") {
    import spark.implicits._
    // op 1 completes (signup then purchase); op 2 starts only; op 3
    // never starts; op 4's purchase PRECEDES its signup (finish key <
    // start key -> still just running, not complete)
    val log = Seq(
      Ev(1, t(0), 1, "signup", 0.0), Ev(2, t(5), 1, "view", 0.0),
      Ev(3, t(9), 1, "purchase", 1.0),
      Ev(4, t(1), 2, "signup", 0.0), Ev(5, t(3), 2, "click", 0.0),
      Ev(6, t(7), 3, "view", 0.0),
      Ev(7, t(8), 4, "purchase", 1.0), Ev(8, t(12), 4, "signup", 0.0))
    val batch = EventStreams.opStatus(log.toDF()).orderBy("op_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(batch == Seq((1L, "complete", 3L), (2L, "running", 2L),
      (3L, "idle", 1L), (4L, "running", 2L)))

    // deliver in two SHUFFLED batches (op 1's finish arrives before its
    // start): the commutative state must still converge to the batch
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.opStatusStream(mem.toDF().as[EventRow])
      .toDF("op_id", "status", "n_events")
      .writeStream.format("memory").queryName("opstat_out")
      .outputMode("update").start()
    mem.addData(Seq(log(2), log(7), log(4), log(5)): _*)
    q.processAllAvailable()
    mem.addData(Seq(log(0), log(1), log(3), log(6)): _*)
    q.processAllAvailable(); q.stop()
    val last = spark.table("opstat_out").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        (k, rs.maxBy(_.getLong(2)).getString(1),
          rs.map(_.getLong(2)).max) }.toSeq.sortBy(_._1)
    assert(last == batch, s"stream state diverged: $last vs $batch")
  }

  test("opLog replay: streaming verdicts equal the batch replay under " +
    "shuffled multi-batch delivery") {
    import spark.implicits._
    // one op exercising every guard branch, one op left running, plus a
    // far-future flush event (op 9) that pushes the watermark past the
    // real events so their buffered verdicts emit
    val log = Seq(
      Ev(1, t(1), 1, "view", 0.0),      // log before start -> not running
      Ev(2, t(2), 1, "signup", 0.0),    // first start -> accepted
      Ev(3, t(3), 1, "view", 0.0),      // running log -> accepted
      Ev(4, t(4), 1, "signup", 0.0),    // dup start -> already running
      Ev(5, t(5), 1, "purchase", 0.0),  // first finish -> accepted
      Ev(6, t(6), 1, "view", 0.0),      // log after finish -> already complete
      Ev(7, t(7), 1, "purchase", 0.0),  // second finish -> not running
      Ev(8, t(8), 1, "signup", 0.0),    // start after finish -> already complete
      Ev(10, t(1), 2, "purchase", 0.0), // finish before start -> not running
      Ev(11, t(2), 2, "signup", 0.0),   // accepted
      Ev(12, t(3), 2, "view", 0.0))     // accepted (op stays running)
    val batch = operators.Warehouse
      .opLogReplay(operators.Warehouse.opEventsOf(log.toDF()))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getBoolean(3), r.getString(4))).toSet

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.opLogStream(mem.toDS().as[EventRow])
      .toDF("op_id", "event_id", "action", "accepted", "reason")
      .writeStream.format("memory").queryName("oplog_out")
      .outputMode("update").start()
    // shuffled split: op 1's finish and dup start arrive before its
    // start; verdicts must wait for event-time order, not arrival order
    mem.addData(Seq(log(4), log(7), log(1), log(9), log(10)): _*)
    q.processAllAvailable()
    mem.addData(Seq(log(0), log(2), log(3), log(5), log(6), log(8)): _*)
    q.processAllAvailable()
    // nothing may emit while the watermark hasn't settled event order
    assert(spark.table("oplog_out").count() == 0)
    mem.addData(Ev(99, t(600), 9, "signup", 0.0))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("oplog_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getBoolean(3), r.getString(4))).toSet
    assert(streamed == batch, s"stream diverged: $streamed vs $batch")
  }

  test("cep stream: emitted verdicts equal the batch sequence matcher exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventRow].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[EventRow]
    val q = EventStreams.cepStream(mem.toDS())
      .toDF("user_id", "signup_id", "signup_ts", "purchase_id",
        "gap_s", "matched")
      .writeStream.format("memory").queryName("cep_out")
      .outputMode("update").start()
    val (a, b) = evs.splitAt(evs.length / 2)
    mem.addData(a.toSeq: _*); q.processAllAvailable()
    mem.addData(b.toSeq: _*); q.processAllAvailable()
    // flush: a type-neutral event far enough out to ripen every signup
    // (watermark delay 1h + match window 1h)
    val maxTs = evs.map(_.ts.getTime).max
    mem.addData(EventRow(999999L,
      new java.sql.Timestamp(maxTs + 3L * 3600 * 1000), 0L, "view", 0.0))
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))
    val streamed = spark.table("cep_out").collect().map(key)
    val batch = graft.operators.Relational.q47SequenceMatch(spark, sf)
      .collect().map(key).toSet
    assert(streamed.toSet == batch,
      s"stream diverged: ${(streamed.toSet -- batch).take(3)} / ${(batch -- streamed.toSet).take(3)}")
    // finality: each verdict emitted exactly once
    assert(streamed.length == batch.size)
  }

  test("sketchWindowChecked: every per-window sketch verdict is true") {
    val rows = EventStreams.sketchWindowChecked(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5),
        s"window ${r.get(0)}/${r.getString(1)}: a sketch escaped its contract")
    }
  }

  test("enrich thresholds the dim: broadcast below, shuffle-hash above, " +
    "identical rows either way") {
    val users = EventStreams.userDim(spark, sf)
    val ev = Tables.events(spark, sf)
    // assert on the stream-dim join (keyed on user_id) specifically —
    // the dim's inner customer-nation join broadcasts nation either way
    val bPlan = EventStreams.enrich(ev, users)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin [user_id"), bPlan)
    val sPlan = EventStreams.enrich(ev, users, maxBroadcastBytes = 0L)
      .queryExecution.executedPlan.toString
    assert(sPlan.contains("ShuffledHashJoin [user_id"), sPlan)
    assert(!sPlan.contains("BroadcastHashJoin [user_id"), sPlan)
    val a = EventStreams.enrich(ev, users)
    val b = EventStreams.enrich(ev, users, maxBroadcastBytes = 0L)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("enrichStream joins stream to static dim across micro-batches " +
    "in both regimes; unknown users keep nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // dim covers user 1 only: user 2's events must survive with null
    // segment/nation (left outer), not drop
    val users = Seq((1L, "SEG_A", "ALPHA"))
      .toDF("c_custkey", "c_mktsegment", "n_name")
    for ((maxBytes, name) <- Seq((-1L, "enr_bcast"), (0L, "enr_shuf"))) {
      val mem = MemoryStream[Ev]
      mem.addData(sample.take(3): _*)
      val q = EventStreams.enrichStream(mem.toDF(), users, maxBytes)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable()
      mem.addData(sample.drop(3): _*)
      q.processAllAvailable(); q.stop()
      val out = spark.table(name).collect()
      assert(out.length == sample.length, s"$name row count")
      val seg = out.map(r => r.getLong(0) -> Option(r.getString(4))).toMap
      assert(seg(1L).contains("SEG_A") && seg(6L).contains("SEG_A"), name)
      assert(seg(4L).isEmpty && seg(5L).isEmpty,
        s"$name: unknown user must enrich to null, not drop")
    }
  }

  test("followStream follower crosses a column-RENAME commit mid-stream") {
    // the q66 column-mapping contract on the STREAMING follower (r17
    // ask #7): a metadata-only rename lands BETWEEN micro-batches; the
    // follower must skip it (rewrite-only, no logical change, cursor
    // still advances past it) and the next data commit's feed speaks
    // the NEW logical name — the consumer converges with zero
    // re-deliveries and no desync
    import spark.implicits._
    import graft.sources.SnapshotLog
    implicit val sqlCtx = spark.sqlContext
    val d = new java.io.File("target/tmp-streamcolmap/follow")
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.getParentFile.mkdirs()
    val path = d.getAbsolutePath
    SnapshotLog.create(spark,
      (0L until 8L).map(k => (k, s"v0_$k")).toDF("k", "p"), path, "k")
    var state: Map[Long, String] =
      (0L until 8L).map(k => k -> s"v0_$k").toMap
    var deliveries = 0
    def fn(feed: org.apache.spark.sql.DataFrame, v: Int): Unit = {
      deliveries += 1
      // the feed presents both sides under vTo's OWN mapping: name the
      // payload as that version's logical schema names it
      val payload = SnapshotLog.columnMapping(path, v)._1.toMap
        .find(_._2 == "p").map(_._1).getOrElse("p")
      feed.select(col("k"), col("change"),
        col(s"_new.$payload").as("p")).collect().foreach { r =>
          if (r.getString(1) == "delete") state -= r.getLong(0)
          else state += (r.getLong(0) -> r.getString(2))
        }
      ()
    }
    val ticks = MemoryStream[Int]
    val q = SnapshotLog.followStream(ticks.toDF(), path, "k", "cmspec")(fn)
    try {
      // batch 1: a plain data commit under the ORIGINAL name
      SnapshotLog.upsert(spark, Seq((0L, "A0")).toDF("k", "p"), path, "k")
      ticks.addData(1); q.processAllAvailable()
      assert(deliveries == 1 && state(0L) == "A0")
      // the rename lands between polls (v2, rewrite-only)
      SnapshotLog.renameColumn(spark, path, "p", "payload")
      // and a data commit under the NEW logical name (v3)
      SnapshotLog.upsert(spark,
        Seq((3L, "new3"), (8L, "new8")).toDF("k", "payload"), path, "k")
      ticks.addData(2); q.processAllAvailable()
      // exactly ONE more delivery: the rename was skipped, not diffed
      assert(deliveries == 2,
        s"rename must be skipped by the stream follower ($deliveries)")
      assert(state.size == 9 && state(3L) == "new3" && state(8L) == "new8")
      // the cursor advanced PAST the skipped rename commit
      assert(SnapshotLog.cursorVersion(path, "cmspec").contains(3))
    } finally q.stop()
  }

  // ---- mid-batch crash-restart fuzz (r18 verdict ask #6): each test
  // kills its stream AFTER the sink's data write but BEFORE the
  // commit/cursor advance — the window the batch-replay specs above
  // never enter — restarts from the checkpoint (or the table's durable
  // cursor), and pins exactly-once EFFECT downstream. ----

  /** ISO timestamp literal for the JSON file-source shards. */
  private def isoTs(min: Int): String =
    new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      .format(t(min))

  test("cdc merge stream: crash after the state-table write, before the " +
    "streaming commit — restart replays to exactly-once state") {
    import spark.implicits._
    import graft.sources.SnapshotLog
    val base = java.nio.file.Files.createTempDirectory("cdc-crash").toString
    val in = s"$base/in"; val table = s"$base/state"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
        "value DOUBLE")
    def shard(name: String, evs: Seq[(Long, Int, Long, String, Double)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        scala.jdk.CollectionConverters.SeqHasAsJava(evs.map {
          case (id, min, u, tpe, v) =>
            s"""{"event_id":$id,"ts":"${isoTs(min)}","user_id":$u,""" +
              s""""event_type":"$tpe","value":$v}"""
        }).asJava)
    // the injected fault: ONE batch dies after its merge landed
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = EventStreams.cdcMergeStream(
        spark.readStream.schema(schema).json(in).as[EventRow])
      .toDF("user_id", "value", "ts", "n_ops", "deleted")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.select(col("user_id"), col("value"), col("ts"),
          col("n_ops"), col("deleted"))
        if (!rows.isEmpty) {
          if (SnapshotLog.latestVersion(table).isEmpty)
            SnapshotLog.create(spark,
              rows.filter(!col("deleted")).drop("deleted"), table, "user_id")
          else
            SnapshotLog.merge(spark, rows, table, "user_id", "deleted")
          // crash AFTER the data write, BEFORE structured streaming
          // commits the batch — the mid-batch window (gated on a data
          // batch: an empty trigger must not absorb the fault)
          if (failOnce.compareAndSet(true, false))
            throw new RuntimeException("injected mid-batch crash")
        }
        ()
      }.start()
    // the cdcMerge spec's log, split so the crash batch carries real ops
    val logA = Seq((1L, 0, 1L, "click", 1.0), (2L, 5, 1L, "view", 2.0),
      (3L, 9, 1L, "error", 0.0), (4L, 1, 2L, "click", 4.0))
    val logB = Seq((5L, 3, 2L, "error", 0.0), (6L, 7, 2L, "purchase", 6.0),
      (7L, 2, 3L, "view", 7.0))
    shard("a.json", logA)
    val q1 = start(); q1.processAllAvailable()
    assert(q1.exception.isEmpty)
    failOnce.set(true)
    shard("b.json", logB)
    try { q1.processAllAvailable() } catch { case _: Throwable => () }
    try { q1.awaitTermination(30000) } catch { case _: Throwable => () }
    assert(q1.exception.isDefined, "the injected crash must kill the query")
    // the data write of the dead batch ALREADY landed (user 3 visible):
    // exactly the torn window the restart must heal idempotently
    assert(SnapshotLog.read(spark, table)
      .filter(col("user_id") === 3L).count() == 1)
    val q2 = start()
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(q2.exception.isEmpty, s"restart failed: ${q2.exception}")
    // exactly-once effect: the replayed batch re-merged the SAME state
    // rows (state store rolled back to the pre-batch version), so the
    // final table equals the batch CDC merge of the full log
    val expect = EventStreams.cdcMerge(
      (logA ++ logB).map { case (id, min, u, tpe, v) =>
        Ev(id, t(min), u, tpe, v) }.toDF())
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(3)))
      .toSet
    val got = SnapshotLog.read(spark, table)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Double]("value"), r.getAs[Long]("n_ops"))).toSet
    assert(got == expect, s"state diverged after replay: $got vs $expect")
  }

  test("followStream: crash after the consumer's write, before the cursor " +
    "advance — the redelivered version converges, exactly once") {
    import spark.implicits._
    import graft.sources.SnapshotLog
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("follow-crash").toString
    val src = s"$base/src"; val mirror = s"$base/mirror"
    SnapshotLog.create(spark,
      (0L until 6L).map(k => (k, s"v0_$k")).toDF("k", "p"), src, "k")
    SnapshotLog.create(spark,
      (0L until 6L).map(k => (k, s"v0_$k")).toDF("k", "p"), mirror, "k")
    val crashAtV2 = new java.util.concurrent.atomic.AtomicBoolean(false)
    var delivered = List.empty[Int]
    def fn(feed: org.apache.spark.sql.DataFrame, v: Int): Unit = {
      // the consumer's DATA WRITE: keyed merge of the change feed into
      // the mirror (deletes carried through) — idempotent by key
      SnapshotLog.merge(spark,
        feed.select(col("k"),
          coalesce(col("_new.p"), lit("")).as("p"),
          (col("change") === "delete").as("del")),
        mirror, "k", "del")
      delivered ::= v
      // crash AFTER the write, BEFORE followDiff advances the cursor
      if (v == 2 && crashAtV2.compareAndSet(true, false))
        throw new RuntimeException("injected crash before cursor advance")
    }
    // three source commits: an upsert, a delete, another upsert
    SnapshotLog.upsert(spark, Seq((1L, "A1"), (6L, "A6")).toDF("k", "p"),
      src, "k")
    SnapshotLog.merge(spark, Seq((2L, "", true)).toDF("k", "p", "del"),
      src, "k", "del")
    SnapshotLog.upsert(spark, Seq((6L, "B6")).toDF("k", "p"), src, "k")
    val ticks = MemoryStream[Int]
    // the poll that will die mid-history: v1 delivers, v2 crashes
    // after its write
    crashAtV2.set(true)
    val q1 = SnapshotLog.followStream(ticks.toDF(), src, "k", "crash")(fn)
    try {
      ticks.addData(1)
      try { q1.processAllAvailable() } catch { case _: Throwable => () }
      try { q1.awaitTermination(30000) } catch { case _: Throwable => () }
      assert(q1.exception.isDefined, "the injected crash must kill the query")
    } finally if (q1.isActive) q1.stop()
    // delivery 1 (v1) committed its cursor; v2's write landed but its
    // cursor did NOT advance — the torn window
    assert(delivered == List(2, 1), s"got $delivered")
    assert(SnapshotLog.cursorVersion(src, "crash").contains(1))
    // restart: v2 is REDELIVERED (the merge re-applies, a no-op by
    // key), then v3 delivers; downstream state is exactly-once
    val ticks2 = MemoryStream[Int]
    val q2 = SnapshotLog.followStream(ticks2.toDF(), src, "k", "crash")(fn)
    try {
      ticks2.addData(2); q2.processAllAvailable()
    } finally q2.stop()
    assert(delivered == List(3, 2, 2, 1),
      s"v2 must be redelivered exactly once, got $delivered")
    assert(SnapshotLog.cursorVersion(src, "crash").contains(3))
    val got = SnapshotLog.read(spark, mirror)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("p")).toMap
    val want = SnapshotLog.read(spark, src)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("p")).toMap
    assert(got == want, s"mirror diverged: $got vs $want")
  }

  test("cep stream: crash on the verdict-emitting batch after the sink " +
    "write — restart replays the verdicts exactly once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("cep-crash").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, " +
        "value DOUBLE")
    def shard(name: String, evs: Seq[(Long, Int, Long, String)]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        scala.jdk.CollectionConverters.SeqHasAsJava(evs.map {
          case (id, min, u, tpe) =>
            s"""{"event_id":$id,"ts":"${isoTs(min)}","user_id":$u,""" +
              s""""event_type":"$tpe","value":1.0}"""
        }).asJava)
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = EventStreams.cepStream(
        spark.readStream.schema(schema).json(in).as[EventRow])
      .toDF("user_id", "signup_id", "signup_ts", "purchase_id",
        "gap_s", "matched")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // batch-id-scoped overwrite (the idempotentParquetSink recipe)
        val n = b.count()
        b.write.mode("overwrite").parquet(s"$out/batch_id=$id")
        // crash only on a VERDICT-emitting batch, after its sink write
        // (the emit may ride a timer-fired no-input batch, so the gate
        // is on the OUTPUT, not the shard)
        if (n > 0 && failOnce.compareAndSet(true, false))
          throw new RuntimeException("injected mid-batch crash")
        ()
      }.start()
    // user 10: signup -> purchase inside the 60-min window (matched);
    // user 11: signup -> error before its purchase (not clean)
    shard("a.json", Seq((1L, 0, 10L, "signup"), (2L, 10, 10L, "purchase"),
      (3L, 0, 11L, "signup"), (4L, 5, 11L, "error"),
      (5L, 20, 11L, "purchase")))
    val q1 = start(); q1.processAllAvailable()
    assert(q1.exception.isEmpty)
    // the flush advances max event time; the NEXT batch (timer-fired
    // no-data batch, or the fallback kick below) carries a watermark
    // past signup + window + delay and EMITS the verdicts — that is
    // the batch the fault kills after its sink write
    failOnce.set(true)
    shard("b.json", Seq((6L, 600, 0L, "view")))
    try { q1.processAllAvailable() } catch { case _: Throwable => () }
    if (q1.exception.isEmpty) {
      // no timer batch fired on its own: kick one more trigger
      shard("c.json", Seq((7L, 610, 0L, "view")))
      try { q1.processAllAvailable() } catch { case _: Throwable => () }
    }
    try { q1.awaitTermination(30000) } catch { case _: Throwable => () }
    assert(q1.exception.isDefined, "the injected crash must kill the query")
    def verdicts() = spark.read.parquet(out)
      .filter(col("signup_id") > 0)
      .select(col("user_id"), col("signup_id"), col("purchase_id"),
        col("matched")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // the dead batch's sink write already landed the verdicts — the
    // torn window the batch-id overwrite must heal on replay
    assert(verdicts().nonEmpty, "the crash batch must have emitted verdicts")
    val q2 = start()
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    assert(q2.exception.isEmpty, s"restart failed: ${q2.exception}")
    val got = verdicts()
    assert(got.length == got.distinct.length,
      s"replay duplicated verdicts: ${got.toSeq}")
    assert(got.toSet == Set((10L, 1L, 2L, true), (11L, 3L, 5L, false)),
      s"verdicts diverged: ${got.toSeq}")
  }
}
