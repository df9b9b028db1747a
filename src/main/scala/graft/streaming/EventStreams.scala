package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.Tables

/** Typed event row for the stateful operators. */
case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                    event_type: String, value: Double)

/** Per-user running statistics (Welford) carried as stream state. */
case class UserStats(n: Long, mean: Double, m2: Double)

/** Per-key CDC state: last op seen (with its ordering key) + op count. */
case class CdcState(ts: Timestamp, eventId: Long, op: String,
                    value: Double, nOps: Long)

/** An emitted anomaly: a value whose z-score against the user's history
  * (events strictly before it) exceeds the threshold. */
case class AnomalyHit(user_id: Long, event_id: Long, ts: Timestamp,
                      value: Double, zscore: Double, n_prev: Long)

/** Per-operation live-status state: least start key, greatest finish
  * key, event count — all commutative folds, so arrival order (within
  * or across batches) cannot change the converged value. Null string =
  * none seen. */
case class OpStatusState(minStart: String, maxFinish: String, n: Long)

/** A buffered event of the streaming CEP matcher: id, event-time in
  * microseconds (ordering), the original timestamp (emitted verbatim —
  * a millis round-trip would drop microseconds), type. */
case class CepEv(eid: Long, us: Long, ts: Timestamp, tpe: String)

/** Per-user CEP buffer: the in-watermark event window (every event a
  * not-yet-finalizable signup could still reference). */
case class CepBuf(buf: Seq[CepEv])

/** Per-operation replay state for the full op-log state machine: the
  * accepted start / finish keys (null = none yet) plus the events still
  * ABOVE the watermark, buffered as (k, event_id, action, ts-millis)
  * until event time order is settled. State size is bounded by one
  * op's events inside the watermark window — the bound any event-time-
  * ordered stateful replay needs. */
case class OpLogState(s: String, f: String,
                      pending: Seq[(String, Long, String, Long)])

/** Event-stream analytics in Structured Streaming form, with
  * batch-equivalent definitions of the same transforms.
  *
  * Each operation is ONE transform function applied to either a batch or
  * a streaming DataFrame — the logical plan is identical, so the batch
  * run (used by the driver's DuckDB oracle) certifies the semantics of
  * the streaming deployment. Streaming entry points add the watermark and
  * are exercised in the spec through MemoryStream.
  *
  * Scale posture: all three are keyed aggregations over bounded keys
  * (event_type x hour, user x session, dedup key), partial-agg friendly,
  * and watermarking bounds state size for unbounded input.
  */
object EventStreams {
  val Watermark = "1 hour"
  val SessionGap = "30 minutes"

  /** Tumbling 1-hour window counts/sums per event type. */
  def windowAgg(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization per user via session_window (the streaming
    * operator); works identically on batch input. */
  def sessionize(events: DataFrame): DataFrame =
    events.groupBy(session_window(col("ts"), SessionGap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("first_ts"), col("last_ts"),
        col("n_events"), col("sum_value"))

  /** At-most-once per (user, event_type, hour): keep the earliest event
    * per key. Batch form is a min_by aggregate — partial-agg friendly
    * (one candidate per key per partition crosses the shuffle), vs a
    * window row_number that sorts every event; the (ts, event_id) struct
    * key makes the pick deterministic. The streaming form is
    * dropDuplicates within the watermark. */
  def dedupKeyed(events: DataFrame): DataFrame =
    events.withColumn("hr", date_trunc("hour", col("ts")))
      .groupBy(col("user_id"), col("event_type"), col("hr"))
      .agg(min_by(struct(col("event_id"), col("value")),
        struct(col("ts"), col("event_id"))).as("row"))
      .select(col("user_id"), col("event_type"), col("hr"),
        col("row.event_id"), col("row.value"))

  // ---- batch query surface (driver contract) ----

  def windowAggBatch(spark: SparkSession, dir: String): DataFrame =
    windowAgg(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("first_ts"))

  def dedupBatch(spark: SparkSession, dir: String): DataFrame =
    dedupKeyed(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("event_type"), col("hr"))

  /** Late-data audit — the watermark-tuning measurement every
    * production stream needs before it picks a delay: replay the
    * arrival sequence (event_id IS the append order of the synthetic
    * stream) with a per-event watermark (running max event time so far,
    * minus the configured delay) and count, per result window, the
    * events that arrive already behind it. Those are the rows a
    * watermarked window aggregate is licensed to DROP — late_frac is
    * the data loss the chosen delay buys. The per-event watermark is
    * the TIGHTEST model (Structured Streaming advances the watermark
    * only between micro-batches, so a real run drops a subset of the
    * flagged rows); an audit that reads 0.1% here licenses the delay,
    * one that reads 10% says widen it.
    *
    * Scale posture: the running max is the two-level prefix shape, not
    * one global sort — per-chunk maxima (map-side agg) take a
    * chunk-count-sized prefix window, broadcast back, and the per-event
    * residual max runs inside bounded chunk partitions; the final
    * rollup is one hash agg. Integer microsecond arithmetic only; the
    * oracle restates the global prefix max directly (same semantics,
    * window form — equality IS the two-level decomposition's proof). */
  def lateAuditOf(events: DataFrame, delayMin: Int = 30,
                  chunkSize: Int = 1024): DataFrame = {
    val delayUs = delayMin.toLong * 60L * 1000000L
    // arrival order: an explicit `arrival` column if the caller models
    // a reordered delivery, else event_id (the append sequence);
    // event_id stays the deterministic tiebreak either way
    val withArrival =
      if (events.columns.contains("arrival")) events
      else events.withColumn("arrival", col("event_id"))
    val ev = withArrival.select(col("event_id"), col("arrival"),
      col("event_type"), col("ts"), unix_micros(col("ts")).as("us"),
      expr(s"arrival div $chunkSize").as("chunk"))
    val chunkPrefix = ev.groupBy(col("chunk"))
      .agg(max(col("us")).as("cmax"))
      .withColumn("prev_max", max(col("cmax")).over(Window
        .orderBy(col("chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("chunk"), col("prev_max"))
    val withWm = ev
      .join(broadcast(chunkPrefix), Seq("chunk"))
      .withColumn("wmax", max(col("us")).over(Window
        .partitionBy(col("chunk")).orderBy(col("arrival"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)))
      // greatest skips nulls; only the stream's very first event has
      // neither a prior chunk nor a prior in-chunk row -> no watermark
      .withColumn("late", coalesce(
        col("us") < greatest(col("prev_max"), col("wmax")) - delayUs,
        lit(false)))
    withWm
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("n_late"),
        (floor(col("n_late") / col("n_events") * 10000.0 + 0.5)
          / 10000.0).as("late_frac"))
  }

  /** The registered audit. The synthetic events table is appended in
    * event-time order (event_id monotone in ts), so the raw table has
    * zero late mass by construction — the query surface plants a
    * deterministic delivery reordering first (the text_pii precedent:
    * plant what the corpus lacks so the detector's output is
    * non-degenerate and oracle-pinned): every 97th event's arrival is
    * pushed 5000 positions later, arriving hours behind the watermark. */
  def lateAuditBatch(spark: SparkSession, dir: String): DataFrame =
    lateAuditOf(Tables.events(spark, dir)
        .withColumn("arrival", when(col("event_id") % 97 === 0,
          col("event_id") + 5000L).otherwise(col("event_id"))))
      .orderBy(col("window_start"), col("event_type"))

  // ---- streaming entry points (same transforms + watermark) ----

  def windowAggStream(events: DataFrame): DataFrame =
    windowAgg(events.withWatermark("ts", Watermark))

  def sessionizeStream(events: DataFrame): DataFrame =
    sessionize(events.withWatermark("ts", Watermark))

  // ---- custom state: flatMapGroupsWithState anomaly detection ----

  val ZThreshold = 3.0
  val MinHistory = 10

  /** One group step: fold this batch's events (sorted by ts for
    * determinism) into the user's running Welford state, emitting events
    * whose z-score against history-so-far crosses the threshold. */
  private def detect(userId: Long, it: Iterator[EventRow],
                     state: GroupState[UserStats]): Iterator[AnomalyHit] = {
    var st = state.getOption.getOrElse(UserStats(0L, 0.0, 0.0))
    val hits = scala.collection.mutable.ArrayBuffer.empty[AnomalyHit]
    it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      if (st.n >= MinHistory) {
        val variance = st.m2 / (st.n - 1)
        if (variance > 0.0) {
          val z = (e.value - st.mean) / math.sqrt(variance)
          if (math.abs(z) > ZThreshold)
            hits += AnomalyHit(userId, e.event_id, e.ts, e.value, z, st.n)
        }
      }
      val n1 = st.n + 1
      val d = e.value - st.mean
      val mean1 = st.mean + d / n1
      st = UserStats(n1, mean1, st.m2 + d * (e.value - mean1))
    }
    state.update(st)
    hits.iterator
  }

  /** Stateful anomaly stream: per-user running mean/variance kept in
    * GroupState; works on a streaming Dataset (incremental state across
    * micro-batches) and on a batch Dataset (single pass) alike. */
  def anomalies(events: Dataset[EventRow]): Dataset[AnomalyHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(detect)
  }

  /** Query surface for [[anomalies]]: value/zscore rounded so the
    * DuckDB oracle (two-pass window avg/var_samp over the prior-event
    * frame) hash-matches the Welford accumulation — the two differ only
    * in ~1e-12 ulps, far inside 2/4-dp rounding, while the anomaly SET
    * itself (the unrounded |z| > 3 cut) is decided identically by both
    * since z never lands within ulps of the threshold. */
  def anomaliesBatch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    anomalies(Tables.events(spark, dir).as[EventRow])
      .toDF()
      .select(col("user_id"), col("event_id"), col("ts"),
        round(col("value"), 2).as("value"),
        round(col("zscore"), 4).as("zscore"), col("n_prev"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", Watermark)
      .withColumn("hr", date_trunc("hour", col("ts")))
      .dropDuplicates("user_id", "event_type", "hr")
      .select(col("user_id"), col("event_type"), col("hr"),
        col("event_id"), col("value"))

  /** Top-k events by value per tumbling window — the k-bounded-heap
    * aggregate ([[graft.functions.TopKByScore]]) running INSIDE the
    * streaming state store: per-window state is k rows, not the window's
    * full event list, so unbounded streams keep bounded state per key.
    * Works identically on batch input (the oracle form). */
  def topkPerWindow(events: DataFrame, k: Int = 3): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopK.top_k_by_score(
        col("value"), col("event_id"), k).as("top"))
      .select(col("window.start").as("window_start"), posexplode(col("top")))
      .select(col("window_start"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("event_id"), col("col.score").as("value"))

  def topkPerWindowBatch(spark: SparkSession, dir: String): DataFrame =
    topkPerWindow(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("rk"))

  def topkPerWindowStream(events: DataFrame, k: Int = 3): DataFrame =
    topkPerWindow(events.withWatermark("ts", Watermark), k)

  /** PRIORITY SAMPLING inside streaming state —
    * [[graft.operators.Sketches.prioritySample]] run per tumbling
    * window on the live stream: the "sample the firehose" operator (a
    * fixed-size weighted sample per hour whose Σ max(w, τ) estimates
    * any subset's value total unbiasedly — Duffield-Lund-Thorup). The
    * k-bounded heap is the per-window STATE, so unbounded streams keep
    * k+1 rows of state per window, never the event list; priorities
    * are the same closed-form LCG uniform, so batch == stream
    * bit-identically and the DuckDB oracle restates the batch form.
    * Windows holding ≤ k events sample everything with τ = 0 (the
    * estimator degrades to exact). */
  def sampleWindow(events: DataFrame, k: Int = 4): DataFrame = {
    // event_id reduced mod 2^31 BEFORE the multiply: the product stays
    // < 2^61, so the LCG never overflows Long at 100 TB id ranges
    // (Spark would wrap silently where DuckDB errors — see
    // [[graft.operators.Sketches.prioritySample]])
    val pr = events.select(col("event_id"), col("ts"), col("value"))
      .withColumn("priority", col("value") /
        ((((col("event_id") % 2147483648L) * 1103515245L + 12345L)
          % 2147483647L + 1L)
          .cast("double") / 2147483648.0))
    pr.groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopK.top_k_by_score(
        col("priority"), col("event_id"), k + 1).as("top"))
      .select(col("window.start").as("window_start"),
        when(size(col("top")) === k + 1,
          element_at(col("top"), k + 1).getField("score"))
          .otherwise(lit(0.0)).as("tau"),
        posexplode(slice(col("top"), 1, k)))
      .select(col("window_start"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("event_id"), col("col.score").as("priority"),
        col("tau"))
  }

  def sampleWindowBatch(spark: SparkSession, dir: String): DataFrame = {
    val sample = sampleWindow(Tables.events(spark, dir))
    Tables.events(spark, dir).select(col("event_id"), col("value"))
      .join(broadcast(sample), Seq("event_id"))
      .select(col("window_start"), col("rk"), col("event_id"),
        col("value"), col("priority"), col("tau"),
        greatest(col("value"), col("tau")).as("est_weight"))
      .orderBy(col("window_start"), col("rk"))
  }

  def sampleWindowStream(events: DataFrame, k: Int = 4): DataFrame =
    sampleWindow(events.withWatermark("ts", Watermark), k)

  /** BOTTOM-K (KMV) SAMPLE inside streaming state —
    * [[graft.operators.Sketches.bottomkSample]] per tumbling window:
    * the mergeable-sample property IS what makes it a streaming
    * sketch (each micro-batch's bottom-k merges into the standing
    * per-window bottom-k without resampling — the k-bounded heap is
    * the state, never the event list). Same mod-reduced LCG uniform,
    * so batch == stream bit-identically and the oracle restates the
    * batch form; the k-th smallest hash estimates the window's event
    * count ((k−1)/h_k), exact for windows with FEWER than k events
    * (the [[sampleWindow]] τ-guard discipline; at exactly k events
    * h_k exists and the estimator is emitted, batch == stream). */
  def bottomkWindow(events: DataFrame, k: Int = 4): DataFrame = {
    val u = events.select(col("event_id"), col("ts"))
      .withColumn("u",
        (((col("event_id") % 2147483648L) * 1103515245L + 12345L)
          % 2147483647L + 1L).cast("double") / 2147483648.0)
    u.groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.TopK.top_k_by_score(
        lit(0.0) - col("u"), col("event_id"), k).as("top"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"),
        when(size(col("top")) === k,
          lit(0.0) - element_at(col("top"), k).getField("score"))
          .as("kth_u"),
        posexplode(col("top")))
      .select(col("window_start"),
        (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("event_id"),
        (lit(0.0) - col("col.score")).as("u"),
        coalesce(lit((k - 1).toDouble) / col("kth_u"),
          col("n_events").cast("double")).as("est_events"),
        col("n_events"))
  }

  def bottomkWindowBatch(spark: SparkSession, dir: String): DataFrame =
    bottomkWindow(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("rk"))

  def bottomkWindowStream(events: DataFrame, k: Int = 4): DataFrame =
    bottomkWindow(events.withWatermark("ts", Watermark), k)

  /** AMS F2 SKETCH inside streaming state —
    * [[graft.operators.Sketches.amsF2]] per tumbling window: the
    * self-join-size / aggregate-skew estimate of each hour's key
    * distribution from `rows` running sums, so per-window state is
    * `rows` longs + a count NO MATTER how many events or distinct
    * users the hour saw (contrast stream_cm_window's depth x width
    * cells — this is the cheapest rung of the windowed-sketch
    * ladder). Sums are commutative folds, so micro-batch arrival
    * order cannot move a bit and batch == stream exactly
    * (spec-pinned). The median estimate is derived AFTER the agg as a
    * pure projection (sorted-array element — an exact order statistic
    * over the window's own `rows` squares, never a second
    * aggregation, which streaming would reject). Same md5-nibble
    * signs as the batch op, so the oracle restates the whole sketch
    * closed-form. */
  def f2Window(events: DataFrame, rows: Int = 9): DataFrame = {
    val ev = events.select(col("ts"), col("user_id"))
      .withColumn("h", md5(col("user_id").cast("string").cast("binary")))
    def nib(i: Int): Column =
      (expr(s"locate(substring(h, $i, 1), '0123456789abcdef')") - 1)
        .cast("bigint")
    def sign(r: Int): Column = lit(1L) - lit(2L) * (nib(r + 1) % 2)
    ev.groupBy(window(col("ts"), "1 hour"))
      .agg(sum(sign(0)).as("s_0"),
        ((1 until rows).map(r => sum(sign(r)).as(s"s_$r")) :+
          count(lit(1)).as("n_events")): _*)
      .select(col("window.start").as("window_start"), col("n_events"),
        element_at(array_sort(array((0 until rows).map(r =>
          col(s"s_$r") * col(s"s_$r")): _*)), (rows + 1) / 2)
          .as("f2_est"),
        posexplode(array((0 until rows).map(r =>
          struct(lit(r).cast("int").as("sketch_row"),
            col(s"s_$r").as("row_sum"))): _*)))
      .select(col("window_start"), col("col.sketch_row").as("sketch_row"),
        col("col.row_sum").as("row_sum"),
        (col("col.row_sum") * col("col.row_sum")).as("row_est"),
        col("f2_est"), col("n_events"))
  }

  def f2WindowBatch(spark: SparkSession, dir: String): DataFrame =
    f2Window(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("sketch_row"))

  def f2WindowStream(events: DataFrame, rows: Int = 9): DataFrame =
    f2Window(events.withWatermark("ts", Watermark), rows)

  /** Sketches INSIDE streaming state: per tumbling window and event
    * type, HLL++ distinct users and mergeable approximate value
    * quantiles. Both aggregates keep fixed-size buffers in the state
    * store (registers / percentile buffer, not the value list), so
    * unbounded streams hold bounded state per window — the streaming
    * variant of [[graft.operators.Sketches]], and the 100 TB answer to
    * "distinct users per hour" where exact distinct state is unpayable.
    * Works identically on batch input (the rows-only query surface). */
  /** Sketch parameters shared by [[sketchWindow]] and its contract
    * check: the verification bounds DERIVE from these (3 x rsd for the
    * HLL estimate, 50/accuracy rank tolerance), so retuning a sketch
    * retunes its contract instead of silently invalidating the check. */
  val SketchRsd = 0.02
  val SketchAccuracy = 2500

  def sketchWindow(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), SketchRsd).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.9)),
          lit(SketchAccuracy)).as("_q"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("approx_users"),
        round(element_at(col("_q"), 1), 2).as("p50"),
        round(element_at(col("_q"), 2), 2).as("p90"),
        col("n_events"))

  def sketchWindowBatch(spark: SparkSession, dir: String): DataFrame =
    sketchWindow(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  def sketchWindowStream(events: DataFrame): DataFrame =
    sketchWindow(events.withWatermark("ts", Watermark))

  /** [[sketchWindowBatch]] restated for the oracle: per (window, type)
    * the HLL estimate must land within max(3 x rsd x exact, 1) of the
    * exact distinct count — the +-1 absolute floor is HLL's register
    * quantization at tiny cardinalities (Spark's dense HLL++ has no
    * sparse-exact mode; measured max deviation on this corpus is
    * exactly 1 at counts of 4-8) — and each percentile estimate's true
    * rank within 0.02 + 1/n of its target (window groups are small, so
    * the 1/n discrete-rank term dominates). The tiny sketch table
    * broadcasts back onto the events scan; DuckDB states every verdict
    * closed-form as TRUE, so a sketch drifting outside its contract
    * breaks the hash match. */
  def sketchWindowChecked(spark: SparkSession, dir: String): DataFrame = {
    // UNROUNDED percentile estimates: ranks probed against the rounded
    // display columns could shift by more than the tolerance where
    // values cluster within half a rounding step of a quantile — a
    // data-dependent false-failure mode. Bounds derive from the shared
    // sketch constants (3 x rsd; 50/accuracy = the hardened rank
    // tolerance), so they track any retuning of sketchWindow.
    val sk = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"))
      .agg(approx_count_distinct(col("user_id"), SketchRsd).as("approx_users"),
        percentile_approx(col("value"), array(lit(0.5), lit(0.9)),
          lit(SketchAccuracy)).as("_q"))
      .select(col("window_start"), col("event_type"), col("approx_users"),
        element_at(col("_q"), 1).as("p50"),
        element_at(col("_q"), 2).as("p90"))
    def rankOk(target: Double, c: String) = {
      val n = count(lit(1))
      val frac = sum(when(col("value") <= col(c), 1L).otherwise(0L)) / n
      (abs(frac - target) <= lit(50.0 / SketchAccuracy) + lit(1.0) / n)
        .as(s"ok_$c")
    }
    Tables.events(spark, dir)
      .withColumn("window_start", date_trunc("hour", col("ts")))
      .join(broadcast(sk), Seq("window_start", "event_type"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (abs(first(col("approx_users")) - countDistinct(col("user_id"))) <=
          greatest(lit(3 * SketchRsd) * countDistinct(col("user_id")),
            lit(1.0))).as("ok_users"),
        rankOk(0.5, "p50"), rankOk(0.9, "p90"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Count-min parameters shared by [[cmWindow]] and its contract check
    * — the same derive-the-bounds discipline as [[SketchRsd]]. */
  val CmDepth = 4
  val CmWidth = 1024

  /** Per-event (row, bucket) cells of the count-min sketch: the
    * declarative form — each event explodes to CmDepth hash cells and
    * the cell counters are ONE partial-agg groupBy, so only depth x
    * width partial rows shuffle (or sit in streaming state) per
    * window, which IS the count-min space bound. */
  private def cmCells(df: DataFrame, extra: Seq[Column]): DataFrame =
    df.withColumn("rb", explode(array((0 until CmDepth).map(i =>
        struct(lit(i).as("r"),
          pmod(xxhash64(lit(i), col("user_id")), lit(CmWidth.toLong))
            .as("b"))): _*)))
      .select(extra :+ col("rb.r").as("r") :+ col("rb.b").as("b"): _*)

  /** Hourly-windowed count-min sketch table over event user_ids —
    * the streaming form of [[graft.operators.Sketches.countMin]]: a
    * bounded (window x depth x width) state footprint that answers
    * per-key frequency queries no matter how many events or distinct
    * users the hour saw. Runs identically as a batch groupBy or a
    * watermarked streaming agg (spec-pinned batch == stream). */
  def cmWindow(events: DataFrame): DataFrame =
    cmCells(events.select(col("ts"), col("user_id")),
      Seq(window(col("ts"), "1 hour").as("window")))
      .groupBy(col("window"), col("r"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("window_start"), col("r"), col("b"),
        col("c"))

  def cmWindowBatch(spark: SparkSession, dir: String): DataFrame =
    cmWindow(graft.Tables.events(spark, dir))
      .orderBy(col("window_start"), col("r"), col("b"))

  def cmWindowStream(events: DataFrame): DataFrame =
    cmWindow(events.withWatermark("ts", Watermark))

  /** SLIDING-window rollup (1 h windows every 30 min) per event type —
    * the streaming twin of the batch q41 query: `window(ts, len,
    * slide)` expands each event to its len/slide windows map-side, so
    * streaming state holds (windows x types) aggregate rows, never
    * events. Distinct users via HLL (exact distinct is not a streaming
    * aggregate; the sketch is deterministic, so batch == stream is
    * exact row equality, spec-pinned). */
  def slidingWindow(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.02).as("n_users_est"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_users_est"))

  def slidingWindowStream(events: DataFrame): DataFrame =
    slidingWindow(events.withWatermark("ts", Watermark))

  /** Oracle-checked contract of [[cmWindow]], batch-side (streaming
    * supports one aggregation per query; the probe pass is a second):
    * per window, every user's min-cell estimate must dominate their
    * exact count (one-sided error) and stay within the Markov bound
    * ceil(e x windowN / width) of it. The sketch table broadcasts onto
    * the probe side; verdicts fold to one row per window, which DuckDB
    * states closed-form with the exact per-window truth. */
  def cmWindowChecked(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("window_start"),
        col("user_id"))
    val table = cmCells(ev, Seq(col("window_start")))
      .groupBy(col("window_start"), col("r"), col("b"))
      .agg(count(lit(1)).as("c"))
    val truth = ev.groupBy(col("window_start"), col("user_id"))
      .agg(count(lit(1)).as("n_true"))
    val winN = ev.groupBy(col("window_start"))
      .agg(count(lit(1)).as("win_n"))
    val est = cmCells(truth,
        Seq(col("window_start"), col("user_id"), col("n_true")))
      .join(broadcast(table), Seq("window_start", "r", "b"))
      .groupBy(col("window_start"), col("user_id"))
      .agg(first(col("n_true")).as("n_true"), min(col("c")).as("est"))
    // per-window sketch-table mass: every event fills exactly CmDepth
    // cells, so sum(c) == CmDepth * window events EXACTLY — an
    // invariant of the TABLE itself the oracle restates (a degenerate
    // est == n_true echo would pass the verdicts but has no table)
    val mass = table.groupBy(col("window_start"))
      .agg(sum(col("c")).as("cell_mass"))
    est.join(broadcast(winN), Seq("window_start"))
      .withColumn("slack",
        greatest(lit(1L),
          ceil(col("win_n") * 2.718281828459045 / CmWidth).cast("long")))
      .groupBy(col("window_start"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("n_true")).as("n_events"),
        (min(when(col("est") >= col("n_true"), 1).otherwise(0)) === 1)
          .as("ge_ok"),
        (min(when(col("est") - col("n_true") <= col("slack"), 1)
          .otherwise(0)) === 1).as("eps_ok"))
      .join(broadcast(mass), Seq("window_start"))
      .select(col("window_start"), col("n_keys"), col("n_events"),
        col("ge_ok"), col("eps_ok"), col("cell_mass"))
      .orderBy(col("window_start"))
  }

  /** Exactly-once parquet sink for a stream: each micro-batch writes to
    * a batch-id-scoped partition directory with overwrite, so a REPLAYED
    * batch (task retry, query restart from checkpoint) overwrites its
    * own previous output instead of appending duplicates — the standard
    * foreachBatch idempotence recipe. Readers see `batch_id` as a normal
    * partition column. */
  def idempotentParquetSink(df: DataFrame, path: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("overwrite").parquet(s"$path/batch_id=$id")
    }

  // ---- stream-stream interval join ----

  val JoinLookback = "10 minutes"

  /** Per purchase: the same user's clicks in the trailing lookback window
    * (click.ts in [purchase.ts - 10 min, purchase.ts]). The join is equi
    * on user_id plus a bounded time-range predicate — the shape Spark's
    * stream-stream join can execute with bounded state, and a per-user
    * hash join in batch. Left outer keeps purchases with no recent
    * clicks (n_clicks_10m = 0). */
  def recentClicksJoin(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.select(col("event_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("value"))
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("value").as("c_value"))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $JoinLookback") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .groupBy(col("event_id"), col("p_user"), col("p_ts"), col("value"))
      .agg(count(col("c_value")).as("n_clicks_10m"),
        round(max(col("c_value")), 2).as("max_click_10m"))
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts").as("ts"), col("value"), col("n_clicks_10m"),
        col("max_click_10m"))
  }

  def intervalJoinBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    recentClicksJoin(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
      .orderBy(col("event_id"))
  }

  /** Streaming form: both sides watermarked; the range condition bounds
    * the click-side state Spark must retain to the lookback + watermark.
    * (Streaming stream-stream joins cannot be left-outer-aggregated in
    * one step, so the streaming surface emits the raw joined pairs;
    * downstream windowed aggregation completes the rollup.) */
  def recentClicksJoinStream(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", Watermark)
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
    val c = clicks.withWatermark("ts", Watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $JoinLookback") &&
        col("c_ts") <= col("p_ts"))
  }

  /** Stream-stream LEFT-OUTER interval join — the attribution shape the
    * inner form can't serve: a purchase with NO prior click must still
    * come out (with a null click), which in streaming can only happen
    * once the click-side watermark proves no matching click can ever
    * arrive. Spark holds the unmatched purchase in state until the
    * watermark passes p_ts (+ the range slack), then emits it
    * null-padded and expires the state — so state stays bounded by
    * watermark + lookback exactly as in the inner join, and the
    * batch-vs-stream spec pins the null rows too. */
  def recentClicksOuterStream(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", Watermark)
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
    val c = clicks.withWatermark("ts", Watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $JoinLookback") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts").as("ts"), round(col("value"), 2).as("value"),
        col("c_ts"), round(col("c_value"), 2).as("click_value"))
  }

  /** Batch twin of [[recentClicksOuterStream]]: the raw left-outer
    * pairs (null click columns preserved), the frame the driver
    * hash-checks. */
  def intervalOuterBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $JoinLookback") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
      .select(col("event_id"), col("p_user").as("user_id"),
        col("p_ts").as("ts"), round(col("value"), 2).as("value"),
        col("c_ts"), round(col("c_value"), 2).as("click_value"))
      .orderBy(col("event_id"), col("c_ts"), col("click_value"))
  }

  /** Stream-stream FULL-OUTER interval join — the symmetric completion
    * of [[recentClicksOuterStream]] (clickstream RECONCILIATION: every
    * purchase AND every click surfaces exactly once, matched or
    * null-padded — the shape that audits "clicks with no purchase"
    * and "purchases with no click" in one feed). Streaming semantics:
    * an unmatched PURCHASE emits null-click once the click watermark
    * passes p_ts (as in left-outer); an unmatched CLICK emits
    * null-purchase once the purchase watermark proves no purchase in
    * [c_ts, c_ts + lookback] can still arrive. State stays bounded by
    * watermark + lookback on BOTH sides — the same eviction the inner
    * join already needs, plus the two null-emission points
    * (spec-pinned against the batch twin, including both null row
    * classes). user_id coalesces across sides so the reconciled feed
    * keys cleanly either way. */
  def recentClicksFullStream(purchases: DataFrame, clicks: DataFrame): DataFrame = {
    val p = purchases.withWatermark("ts", Watermark)
      .select(col("event_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
    val c = clicks.withWatermark("ts", Watermark)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    // full-outer cannot broadcast, and the default would sort-merge on
    // user_id — a per-batch sort of both unsorted streams. Shuffle-hash
    // full-outer (SPARK-32399) hashes the click side per user instead;
    // the streaming form keys state the same way.
    p.join(c.hint("shuffle_hash"),
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $JoinLookback") &&
          col("c_ts") <= col("p_ts"),
        "full_outer")
      .select(col("event_id"),
        coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("p_ts").as("ts"), round(col("value"), 2).as("value"),
        col("c_ts"), round(col("c_value"), 2).as("click_value"))
  }

  /** Batch twin of [[recentClicksFullStream]]: the raw full-outer pairs
    * with both null-padding classes, the frame the driver hash-checks. */
  def intervalFullBatch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    recentClicksFullStream(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"))
      .orderBy(col("event_id"), col("user_id"), col("c_ts"),
        col("click_value"))
  }

  // ---- stream-static enrichment join ----

  /** Enrich each event with its user's dimension attributes (market
    * segment + nation) — the reference's fetchOrigins join
    * (app/index.js:233-246) as a continuous pipeline. Left outer: an
    * event from an unknown user enriches to nulls, it doesn't drop.
    *
    * The dim-side strategy is THRESHOLDED, not unconditionally
    * broadcast: customer is the fact-keyed user dimension, and at 100x
    * scale tens of millions of users would blow the broadcast threshold
    * (or the driver heap). Below `maxBroadcastRows` the dim broadcasts
    * — a stateless map-side join per micro-batch, no state store or
    * watermark, dim updates picked up by re-planning (batch) or restart
    * (stream). Above it the join degrades gracefully to SHUFFLE_HASH on
    * the dim side: stream-static joins stay stateless under any join
    * strategy, and hashing the dim avoids sort-merge's per-batch sort of
    * the unsorted stream side. (A pre-bucketed dim via
    * [[graft.sources.Bucketed]] removes even that exchange.) The sizing
    * probe is Catalyst's own optimized-plan size estimate against the
    * session's autoBroadcastJoinThreshold — the statistic Spark's join
    * planner itself consults — so no action runs and the dim plan is
    * never executed just to be measured (a count() probe was measured
    * doubling the query at sf0.1). `maxBroadcastBytes >= 0` overrides
    * the threshold (0 forces the shuffle-hash regime, as the specs do);
    * a disabled threshold (-1) correctly lands every dim in it. */
  def enrich(events: DataFrame, users: DataFrame,
             maxBroadcastBytes: Long = -1L): DataFrame = {
    val limit =
      if (maxBroadcastBytes >= 0L) BigInt(maxBroadcastBytes)
      else BigInt(users.sparkSession.sessionState.conf.autoBroadcastJoinThreshold)
    val dim =
      if (users.queryExecution.optimizedPlan.stats.sizeInBytes <= limit)
        broadcast(users)
      else users.hint("SHUFFLE_HASH")
    events.join(dim, col("user_id") === col("c_custkey"), "left_outer")
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        col("c_mktsegment").as("segment"), col("n_name").as("nation"))
  }

  /** The user dimension: customer joined to nation. nation is
    * dim-sized by definition; customer is only broadcast-sized until it
    * isn't — [[enrich]] thresholds it. */
  def userDim(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_name"))

  def enrichBatch(spark: SparkSession, dir: String): DataFrame =
    enrich(Tables.events(spark, dir), userDim(spark, dir))
      .orderBy(col("event_id"))

  def enrichStream(events: DataFrame, users: DataFrame,
                   maxBroadcastBytes: Long = -1L): DataFrame =
    enrich(events, users, maxBroadcastBytes)

  // ---- CDC merge: materialize a keyed changelog into current state ----

  /** Changelog view of the event stream: 'error' events act as DELETE
    * ops for their user key, everything else as an UPSERT carrying the
    * event's value — the shape a CDC feed (Debezium-style) delivers. */
  private def asChangelog(events: DataFrame): DataFrame =
    events.withColumn("op",
      when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("upsert")))

  /** Batch semantics of the merge: per key, the LAST op in (ts,
    * event_id) order wins; keys whose last op is a delete are absent
    * from the materialized state. One max_by aggregation — partial-agg
    * friendly, no window sort over the changelog — plus the per-key op
    * count for audit. The streaming twin ([[cdcMergeStream]]) keeps the
    * same (last-op, count) pair in GroupState and must converge to this
    * exact table — spec-pinned, and the oracle restates it as a plain
    * last-row-per-key SQL. */
  def cdcMerge(events: DataFrame): DataFrame =
    asChangelog(events)
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("op"), col("value"), col("ts")),
        struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_ops"))
      .filter(col("last.op") =!= "delete")
      .select(col("user_id"), col("last.value").as("value"),
        col("last.ts").as("ts"), col("n_ops"))

  def cdcMergeBatch(spark: SparkSession, dir: String): DataFrame =
    cdcMerge(Tables.events(spark, dir)).orderBy(col("user_id"))

  /** Streaming merge: GroupState holds one (last-op, count) record per
    * key — fixed-size state however long the changelog runs. Emits the
    * key's CURRENT materialized row after each batch (value row, or a
    * tombstone marker via the deleted flag so a sink can retract).
    * Folding is (ts, event_id)-ordered inside a batch and monotone
    * across batches, so replays/out-of-order batches cannot regress the
    * VALUE state — the idempotence a MERGE sink needs. (Engine-level
    * replays are already exactly-once via the state store rollback;
    * n_ops counts delivered records, so source-level duplicate
    * DELIVERY — at-least-once upstream — inflates the audit count but
    * never the materialized value.) */
  // ---- operation live-status view ----

  /** Batch semantics of the reference's "is this operation running?"
    * live view (operation.js isStarted/isCompleted over the op +
    * operations_logs tables): status per operation derived from the
    * [[graft.operators.Warehouse.opEventsOf]] event view. The full
    * per-event replay (q42_op_log) needs event order; the STATUS alone
    * collapses to two commutative extrema — an accepted finish exists
    * iff the greatest finish key exceeds the least start key — so the
    * rollup is ONE partial-agg groupBy with no window, and the
    * streaming twin can hold fixed-size, order-insensitive state. */
  def opStatus(events: DataFrame): DataFrame =
    graft.operators.Warehouse.opEventsOf(events)
      .groupBy(col("op_id"))
      .agg(min(when(col("action") === "start", col("k"))).as("s"),
        max(when(col("action") === "finish", col("k"))).as("f"),
        count(lit(1)).as("n_events"))
      .select(col("op_id"),
        when(col("s").isNotNull && col("f") > col("s"), lit("complete"))
          .when(col("s").isNotNull, lit("running"))
          .otherwise(lit("idle")).as("status"),
        col("n_events"))

  def opStatusBatch(spark: SparkSession, dir: String): DataFrame =
    opStatus(Tables.events(spark, dir)).orderBy(col("op_id"))

  /** Streaming twin: GroupState holds [[OpStatusState]] — two string
    * extrema and a count per operation, fixed size forever. Because
    * every fold is commutative and associative, out-of-order delivery
    * across micro-batches converges to exactly the batch table (the
    * spec feeds a shuffled two-batch split and compares). Emits the
    * operation's CURRENT status row each batch — the live dashboard
    * row the reference serves from Postgres. */
  def opStatusStream(events: Dataset[EventRow]): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    def kOf(e: EventRow): String = {
      val micros = math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
        (e.ts.getNanos / 1000L) % 1000000L
      f"$micros%020d${e.event_id}%012d"
    }
    def step(opId: Long, it: Iterator[EventRow],
             state: GroupState[OpStatusState]): Iterator[(Long, String, Long)] = {
      var st = state.getOption.getOrElse(OpStatusState(null, null, 0L))
      it.foreach { e =>
        val k = kOf(e)
        val isStart = e.event_type == "signup"
        val isFinish = e.event_type == "purchase"
        st = OpStatusState(
          if (isStart && (st.minStart == null || k < st.minStart)) k
          else st.minStart,
          if (isFinish && (st.maxFinish == null || k > st.maxFinish)) k
          else st.maxFinish,
          st.n + 1L)
      }
      state.update(st)
      val status =
        if (st.minStart != null && st.maxFinish != null &&
          st.maxFinish > st.minStart) "complete"
        else if (st.minStart != null) "running"
        else "idle"
      Iterator.single((opId, status, st.n))
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(step)
  }

  /** Per-operation dashboard rollup of the FULL op-log replay — the
    * operations table the reference assembles from op + operations_logs
    * (operation.js:245 last-log fetch + the :309 start/finish guards):
    * per op, how many log writes were accepted and how many were
    * rejected by each guard, plus the final status. Derived from
    * [[graft.operators.Warehouse.opLogReplay]]'s OWN columns (one
    * definition of accepted/reason — the composition cannot drift from
    * q42), collapsed by one partial-agg groupBy. */
  def opLogSummaryBatch(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Warehouse.q42OpLog(spark, dir)
      .groupBy(col("op_id"), col("status_final"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("accepted"), 1L).otherwise(0L)).as("n_accepted"),
        sum(when(col("reason") === "not running", 1L).otherwise(0L))
          .as("n_rej_not_running"),
        sum(when(col("reason") === "already running", 1L).otherwise(0L))
          .as("n_rej_already_running"),
        sum(when(col("reason") === "already complete", 1L).otherwise(0L))
          .as("n_rej_already_complete"))
      .orderBy(col("op_id"))

  /** Streaming twin of the FULL per-event replay (q42_op_log) — the
    * GroupState form of the operation.js state machine. Unlike
    * [[opStatusStream]]'s commutative extrema, per-event verdicts
    * depend on event-time ORDER (a late-arriving earlier start changes
    * which finish is "first after start"), so the twin uses the
    * watermark-sorted buffer pattern: events buffer in state while
    * above the watermark; once the watermark passes them they are
    * folded in key order through the SAME sequential guards the batch
    * window pass expresses closed-form, and their verdicts emit
    * exactly once (Update mode). An event-time timeout re-fires the
    * group when buffered events ripen with no new arrivals. For any
    * input respecting the watermark, emitted verdicts equal the batch
    * replay's rows (the spec shuffles a two-batch split and compares);
    * retained state per op is the (s, f) scalars plus only the
    * in-watermark buffer.
    *
    * State retention: a completed op's (s, f) scalars are retained for
    * the stream's lifetime BY DESIGN — batch semantics require a late
    * "already complete" rejection for any event that arrives after the
    * finish, at any distance, so the keys can never be dropped without
    * changing verdicts. State is two string keys + an empty buffer per
    * distinct op_id (bounded by op cardinality, not event volume); a
    * deploy whose op_id space is unbounded should front this with a
    * TTL policy that accepts forgetting rejects for ops idle past the
    * TTL — that is a semantics change, so it is a caller opt-in, not a
    * default here. */
  def opLogStream(events: Dataset[EventRow]): Dataset[(Long, Long, String, Boolean, String)] = {
    import events.sparkSession.implicits._
    def kOf(e: EventRow): String = {
      val micros = math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
        (e.ts.getNanos / 1000L) % 1000000L
      f"$micros%020d${e.event_id}%012d"
    }
    def actionOf(e: EventRow): String = e.event_type match {
      case "signup" => "start"
      case "purchase" => "finish"
      case _ => "log"
    }
    def step(opId: Long, it: Iterator[EventRow],
             state: GroupState[OpLogState]): Iterator[(Long, Long, String, Boolean, String)] = {
      val prev = state.getOption.getOrElse(OpLogState(null, null, Seq.empty))
      val all = prev.pending ++
        it.map(e => (kOf(e), e.event_id, actionOf(e), e.ts.getTime))
      val wm = state.getCurrentWatermarkMs()
      val (ripe, hold) = all.partition(_._4 <= wm)
      var s = prev.s
      var f = prev.f
      val out = ripe.sortBy(_._1).map { case (k, eid, action, _) =>
        action match {
          case "start" =>
            if (s == null) { s = k; (opId, eid, action, true, null: String) }
            else (opId, eid, action, false,
              if (f != null && k > f) "already complete" else "already running")
          case "log" =>
            if (s != null && f == null && k > s)
              (opId, eid, action, true, null: String)
            else (opId, eid, action, false,
              if (f != null && k > f) "already complete" else "not running")
          case _ => // finish
            if (s != null && f == null && k > s) {
              f = k; (opId, eid, action, true, null: String)
            } else (opId, eid, action, false, "not running")
        }
      }
      state.update(OpLogState(s, f, hold))
      // re-fire when the earliest buffered event ripens (its ts is
      // > wm by the partition above, as setTimeoutTimestamp requires)
      if (hold.nonEmpty) state.setTimeoutTimestamp(hold.map(_._4).min)
      out.iterator
    }
    events.withWatermark("ts", Watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(step)
  }

  /** Streaming twin of q47_sequence_match — the CEP pattern "signup
    * then purchase within 1h, no error between" running on the LIVE
    * stream. A signup's verdict is decidable exactly when the watermark
    * passes signup + window: every event that could supply the match
    * (first following purchase inside the window) or block it (an
    * error before that purchase) has event time ≤ signup + window, so
    * the watermark guarantee makes the verdict FINAL — it emits once
    * (Update mode) and equals the batch operator's row (a first
    * purchase beyond the window yields the same matched = false /
    * sentinel row as no purchase at all, so nothing outside the window
    * is ever needed). State per user is ONE WINDOW of events: an event
    * can only be referenced by signups up to `window` before it, all
    * finalized once the watermark passes event + window — buffered
    * rows are evicted on exactly that condition, so retention is
    * bounded by per-user event rate x window, independent of stream
    * length. An event-time timeout (earliest pending signup + window,
    * +1 ms against the us→ms floor) re-fires the group when a pending
    * signup ripens with no new arrivals. */
  def cepStream(events: Dataset[EventRow], windowUs: Long = 3600000000L)
      : Dataset[(Long, Long, Timestamp, Long, Long, Boolean)] = {
    import events.sparkSession.implicits._
    def usOf(e: EventRow): Long =
      math.floorDiv(e.ts.getTime, 1000L) * 1000000L +
        (e.ts.getNanos / 1000L) % 1000000L
    def step(userId: Long, it: Iterator[EventRow],
             state: GroupState[CepBuf])
        : Iterator[(Long, Long, Timestamp, Long, Long, Boolean)] = {
      val prev = state.getOption.getOrElse(CepBuf(Seq.empty))
      val all = (prev.buf ++ it.map(e =>
        CepEv(e.event_id, usOf(e), e.ts, e.event_type)))
        .sortBy(e => (e.us, e.eid))
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val (ripe, hold) = all.filter(_.tpe == "signup")
        .partition(s => s.us + windowUs <= wmUs)
      val out = ripe.map { s =>
        val after = all.filter(e =>
          e.us > s.us || (e.us == s.us && e.eid > s.eid))
        val p = after.find(_.tpe == "purchase")
        val err = after.find(_.tpe == "error")
        val inWin = p.exists(_.us <= s.us + windowUs)
        val clean = p.nonEmpty && err.forall(ev =>
          ev.us > p.get.us || (ev.us == p.get.us && ev.eid > p.get.eid))
        (userId, s.eid, s.ts,
          if (inWin) p.get.eid else -1L,
          if (inWin) (p.get.us - s.us) / 1000000L else -1L,
          inWin && clean)
      }
      // evict everything no pending-or-future signup can reference; a
      // user whose events have ALL ripened gets state.remove(), not an
      // empty-buffer update — without a timeout nothing would ever
      // clear the empty CepBuf, and a long-running stream carries one
      // dead state-store entry per ever-seen user forever
      val keep = all.filter(_.us + windowUs > wmUs)
      if (keep.isEmpty && hold.isEmpty) state.remove()
      else state.update(CepBuf(keep))
      if (hold.nonEmpty)
        state.setTimeoutTimestamp(
          hold.map(_.ts.getTime).min + windowUs / 1000L + 1L)
      out.iterator
    }
    events.withWatermark("ts", Watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(step)
  }

  // ---- incremental materialized view over SnapshotLog ----

  /** Batch target of the INCREMENTAL MATERIALIZED VIEW: the hourly
    * per-type count/sum rollup (q49_view_maintain's view semantics as
    * a full recompute — the table the streaming maintenance loop must
    * converge to after any batch split). */
  def viewMaintain(events: DataFrame): DataFrame =
    events
      .select(date_trunc("hour", col("ts")).as("window_start"),
        col("event_type"), col("value"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))

  def viewMaintainBatch(spark: SparkSession, dir: String): DataFrame =
    viewMaintain(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  /** The view state table's packed long key: (hour epoch, event-type
    * code). Hour-major, so a live stream's recent windows cluster at
    * the key-range tail and SnapshotLog's [min,max] stats confine each
    * refresh's segment rewrites to the hot tail. The type dictionary
    * is fixed (the events contract); an unknown type fails loudly
    * rather than colliding into another group's state. */
  private val ViewTypeCodes =
    Seq("click", "error", "purchase", "signup", "view")
  private def viewKey: Column = {
    val code = ViewTypeCodes.zipWithIndex
      .foldLeft(raise_error(concat(lit("unknown event_type "),
        col("event_type"))).cast("long")) { case (acc, (t, i)) =>
        when(col("event_type") === t, lit(i.toLong)).otherwise(acc)
      }
    floor(unix_seconds(col("window_start")) / 3600L) * 8L + code
  }

  /** STREAMING view maintenance — [[graft.operators.Warehouse
    * .q49ViewMaintain]]'s mergeable-state algebra run as the
    * production foreachBatch loop over a [[graft.sources.SnapshotLog]]
    * table: each micro-batch reduces map-side to per-group (count,
    * raw sum) deltas, ADDS them onto the standing state of exactly the
    * touched groups (a groups-sized left join — the base history is
    * never rescanned), and commits ONE atomic version per non-empty
    * batch — so every refresh is a pinned, time-travelable version and
    * a crash between batches leaves the last good version serving.
    * Untouched groups ride forward by segment reference (SnapshotLog's
    * copy-on-write, helped by the hour-major key packing). The stored
    * state keeps the RAW sum; rounding is presentation, applied by
    * [[viewMaintainRead]] — compounding round-then-add drift across
    * thousands of refreshes is how incremental views silently diverge
    * from their definition. */
  def viewMaintainStream(events: DataFrame, path: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = batch
          .select(date_trunc("hour", col("ts")).as("window_start"),
            col("event_type"), col("value"))
          .groupBy(col("window_start"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_raw"))
          .withColumn("k", viewKey)
          .select(col("k"), col("window_start"), col("event_type"),
            col("n_events"), col("sum_raw"))
        if (!delta.isEmpty) {
          val spark = batch.sparkSession
          import graft.sources.SnapshotLog
          if (SnapshotLog.latestVersion(path).isEmpty)
            SnapshotLog.create(spark, delta, path, "k")
          else {
            val standing = SnapshotLog.read(spark, path)
              .select(col("k"), col("n_events").as("n_b"),
                col("sum_raw").as("s_b"))
            val upserts = delta
              .join(standing.hint("shuffle_hash"), Seq("k"), "left_outer")
              .select(col("k"), col("window_start"), col("event_type"),
                (col("n_events") + coalesce(col("n_b"), lit(0L)))
                  .as("n_events"),
                (col("sum_raw") + coalesce(col("s_b"), lit(0.0)))
                  .as("sum_raw"))
            SnapshotLog.upsert(spark, upserts, path, "k")
          }
        }
        ()
      }
      .start()

  /** The maintained view as a consumer reads it (latest or a pinned
    * version): presentation rounding applied to the stored raw state,
    * same output shape as [[viewMaintain]]. */
  def viewMaintainRead(spark: SparkSession, path: String,
                       version: Option[Int] = None): DataFrame =
    graft.sources.SnapshotLog.read(spark, path, version)
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("sum_raw"), 2).as("sum_value"))

  def cdcMergeStream(events: Dataset[EventRow]): Dataset[(Long, Double, Timestamp, Long, Boolean)] = {
    import events.sparkSession.implicits._
    def step(userId: Long, it: Iterator[EventRow],
             state: GroupState[CdcState]): Iterator[(Long, Double, Timestamp, Long, Boolean)] = {
      var st = state.getOption.orNull
      it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val op = if (e.event_type == "error") "delete" else "upsert"
        val newer = st == null || e.ts.getTime > st.ts.getTime ||
          (e.ts.getTime == st.ts.getTime && e.event_id > st.eventId)
        val n = if (st == null) 1L else st.nOps + 1L
        st = if (newer) CdcState(e.ts, e.event_id, op, e.value, n)
        else st.copy(nOps = n)
      }
      state.update(st)
      Iterator.single((userId, st.value, st.ts, st.nOps, st.op == "delete"))
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(step)
  }
}
