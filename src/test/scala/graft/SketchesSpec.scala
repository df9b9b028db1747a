package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  import TestSession._

  test("HLL distinct estimate is within the configured error bound") {
    val rows = Sketches.distinctUsers(spark, sf, rsd = 0.02).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // HLL++ rsd is a standard deviation, not a hard bound — allow 5 sigma
      assert(r.getDouble(4) <= 0.10,
        s"${r.getString(0)}: rel_err ${r.getDouble(4)} vs exact ${r.getLong(2)}")
    }
  }

  test("approx quantiles are ordered and bracket the true median") {
    val rows = Sketches.valueQuantiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99, s"${r.getString(0)}: not monotone")
    }
    // cross-check p50 of one group against the exact percentile
    val et = rows.head.getString(0)
    val exact = Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    val approx = rows.head.getDouble(1)
    // at 10k accuracy on test-scale data the sketch is near-exact
    assert(math.abs(approx - exact) <= math.max(1.0, math.abs(exact) * 0.05))
  }

  test("checked restatements: every within-contract verdict is true") {
    val d = Sketches.distinctUsersChecked(spark, sf).collect()
    assert(d.nonEmpty && d.forall(_.getBoolean(3)),
      "HLL estimate escaped its 3x-rsd bound")
    val q = Sketches.valueQuantilesChecked(spark, sf).collect()
    assert(q.nonEmpty &&
      q.forall(r => r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4)),
      "a percentile estimate's true rank escaped its tolerance")
  }

  test("Misra-Gries with k < vocab: heavy survivors, lower-bound counts") {
    import spark.implicits._
    import graft.functions.MisraGries.mg_sketch
    import org.apache.spark.sql.functions.{col, explode}
    // skewed stream: "hot" = 400 of 1000 items (40% >> n/k with k=5);
    // "warm" = 200; the rest is a 40-item uniform tail forcing
    // constant evictions in every partition
    val items = Seq.fill(400)("hot") ++ Seq.fill(200)("warm") ++
      (0 until 400).map(i => s"cold_${i % 40}")
    val df = scala.util.Random.shuffle(items).toDF("item")
      .repartition(8) // exercise partial summaries + merges
    val mg = df.agg(mg_sketch(col("item"), 5).as("mg"))
      .select(explode(col("mg")).as("c"))
      .select(col("c.item"), col("c.est")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mg.size <= 5, "summary must keep at most k counters")
    assert(mg.contains("hot"),
      "an item with freq > n/k must survive (deterministic guarantee)")
    assert(mg("hot") <= 400 && mg("hot") >= 400 - 1000 / 5,
      s"estimate ${mg("hot")} must be a lower bound within n/k of truth")
    mg.get("warm").foreach(e => assert(e <= 200))
  }

  test("heavyHitters two-pass pipeline equals exact frequencies above n/k") {
    import org.apache.spark.sql.functions.{col, explode, length, split, count, lit}
    val rows = Sketches.heavyHitters(spark, sf).collect()
    assert(rows.nonEmpty, "test corpus must surface heavy tokens")
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val n = toks.count()
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
      .filter(col("c") > n / 50.0).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == exact)
    rows.foreach(r => assert(r.getLong(2) == n))
  }

  test("countMin: exact truth, both contract verdicts hold at the default width") {
    val rows = operators.Sketches.countMin(spark, sf).collect()
    val exact = Tables.events(spark, sf).groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == exact.size && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getLong(0)))
      assert(r.getBoolean(2), s"user ${r.getLong(0)} underestimated")
      assert(r.getBoolean(3), s"user ${r.getLong(0)} outside the Markov bound")
    }
  }

  test("countMin one-sided error survives a pathologically narrow sketch") {
    // width 8 forces heavy collisions: estimates inflate but can never
    // undercount — the structural count-min property
    val rows = operators.Sketches.countMin(spark, sf, width = 8).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2),
      s"user ${r.getLong(0)} underestimated under collision pressure"))
  }

  test("bloom filter: no false negatives, measured fpr matches a recompute") {
    val r = Sketches.bloomFilter(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (m, k) = (row.getInt(0), row.getInt(1))
    assert(m == 16384 && k == 3)
    // THE bloom guarantee: every inserted key passes its own probe
    assert(row.getBoolean(5), "bloom filter produced a false negative")
    // bounded state: the filter can never exceed m bits, and inserting
    // n keys sets at most k*n of them
    val bitsSet = row.getLong(3)
    assert(bitsSet <= m.toLong &&
      bitsSet <= k.toLong * row.getLong(2))
    // in-memory recompute of the whole sketch: same bits, same verdicts
    val md = java.security.MessageDigest.getInstance("MD5")
    def bits(id: Long): Seq[Long] = {
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until k).map(j =>
        java.lang.Long.parseLong(h.substring(j * 4, j * 4 + 4), 16) % m)
    }
    val ids = Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val built = ids.filter(_ % 2 == 0).flatMap(bits).toSet
    assert(built.size.toLong == bitsSet)
    val fps = ids.filter(_ % 2 != 0).count(id => bits(id).forall(built))
    assert(row.getLong(6) == fps.toLong, s"fpr count ${row.getLong(6)} vs $fps")
    val nonMembers = ids.count(_ % 2 != 0)
    assert(row.getDouble(7) ==
      math.floor(fps.toDouble / nonMembers * 1e4 + 0.5) / 1e4)
  }

  test("bloom merge: union filter preserves members, inclusion-exclusion exact") {
    val r = Sketches.bloomMerge(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    // the merge contract: OR of shard filters loses no member
    assert(row.getBoolean(8), "merge produced a false negative")
    // set-bit counts obey inclusion-exclusion exactly
    assert(row.getBoolean(6))
    assert(row.getLong(5) ==
      row.getLong(2) + row.getLong(3) - row.getLong(4))
    // the merged filter equals the filter built over the union corpus:
    // same bits_set as sketch_bloom's (whose insert set IS shard A + B)
    val whole = Sketches.bloomFilter(spark, sf).collect().head
    assert(row.getLong(5) == whole.getLong(3),
      "merged filter differs from the directly-built union filter")
    assert(row.getLong(7) == whole.getLong(2), "member count mismatch")
  }

  test("hll union: per-type and merged verdicts hold, union row present") {
    val rows = Sketches.hllUnion(spark, sf).collect()
    val union = rows.filter(_.getString(0) == "__union__")
    assert(union.length == 1, "exactly one union row")
    rows.foreach(r => assert(r.getBoolean(2),
      s"${r.getString(0)}: estimate escaped its 3-sigma contract"))
    // the union row's exact count must equal the global distinct
    val exact = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(union.head.getLong(1) == exact)
  }

  test("kmv theta intersect: exact below k, estimate within contract above") {
    import spark.implicits._
    // planted cohorts: |A| = |B| = 2000, overlap exactly 1000
    val a = (1L to 2000L).toDF("user_id")
    val b = (1001L to 3000L).toDF("user_id")
    // ESTIMATE mode: cohorts and union all exceed k = 128
    val est = Sketches.kmvIntersect(a, b, 128, 0.25).collect().head
    assert(est.getLong(1) == 2000 && est.getLong(2) == 2000)
    assert(est.getLong(8) == 1000, "exact intersection ground truth")
    assert(est.getBoolean(9) && est.getBoolean(10) && est.getBoolean(11),
      s"contract violated: est_a=${est.getDouble(3)} " +
        s"est_b=${est.getDouble(4)} est_i=${est.getDouble(7)}")
    assert(est.getDouble(3) != 2000.0, "should be estimating, not counting")
    // EXACT mode: k above every cohort — the sketch IS the distinct set
    // and every estimate collapses to the exact count
    val ex = Sketches.kmvIntersect(a, b, 8192, 0.25).collect().head
    assert(ex.getDouble(3) == 2000.0 && ex.getDouble(4) == 2000.0)
    assert(ex.getDouble(5) == 3000.0, "union estimate exact below k")
    assert(ex.getDouble(7) == 1000.0 && ex.getLong(8) == 1000)
    // the registered events-table query holds its contract end-to-end
    val reg = Sketches.thetaIntersect(spark, sf).collect()
    assert(reg.length == 1)
    assert(reg.head.getBoolean(9) && reg.head.getBoolean(10) &&
      reg.head.getBoolean(11))
  }

  test("weighted quantiles: brute-force weighted rank recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), 1L + r.getLong(2) % 5L))
    val out = Sketches.weightedQuantiles(spark, sf).collect()
    val byType = ev.groupBy(_._1)
    assert(out.map(_.getString(0)).toSet == byType.keySet)
    out.foreach { r =>
      val g = byType(r.getString(0)).sortBy(_._2)
      val tw = g.map(_._3).sum
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == tw)
      def wq(num: Long, den: Long): Double = {
        var cum = 0L
        g.collectFirst { case (_, v, w) if { cum += w; cum * den >= tw * num } => v }.get
      }
      assert(r.getDouble(3) == wq(1, 2), s"${r.getString(0)} p50")
      assert(r.getDouble(4) == wq(9, 10), s"${r.getString(0)} p90")
      assert(r.getDouble(3) <= r.getDouble(4))
    }
  }

  test("priority sample: exact recompute, and the DLT estimator lands near") {
    val k = 64
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    // in-memory priorities with the same mod-reduced LCG uniform
    val pri = ev.map { case (id, v) =>
      val u = (((id % 2147483648L) * 1103515245L + 12345L)
        % 2147483647L + 1L).toDouble / 2147483648.0
      (id, v, v / u)
    }.sortBy(p => (-p._3, p._1))
    val tau = pri(k)._3
    val out = Sketches.prioritySample(spark, sf).collect()
    assert(out.length == k)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i + 1)
      assert(r.getLong(1) == pri(i)._1, s"rank ${i + 1} id")
      assert(r.getDouble(3) == pri(i)._2)
      assert(r.getDouble(4) == pri(i)._3)
      assert(r.getDouble(5) == tau)
      assert(r.getDouble(6) == math.max(pri(i)._2, tau))
    }
    // unbiased subset-sum estimator: the full-population estimate from
    // 64 of n items lands within 50% (sigma ~ 1/sqrt(k-1) ~ 12.6%)
    val est = out.map(_.getDouble(6)).sum
    val truth = ev.map(_._2).sum
    assert(math.abs(est - truth) / truth < 0.5,
      s"estimate $est vs truth $truth")
    // BOUNDARY: k >= n means the whole population is the sample and
    // τ = 0 (the guard, not a null element_at) — the estimator is exact
    val small = Sketches.prioritySample(spark, sf, k = ev.length + 10)
      .collect()
    assert(small.length == ev.length, "k >= n samples everything")
    small.foreach { r =>
      assert(r.getDouble(5) == 0.0, "tau must be 0 when n <= k")
      assert(r.getDouble(6) == r.getDouble(3), "estimator exact at tau=0")
    }
  }

  test("bottom-k sample: exact recompute, mergeable, estimator bounded, under-full exact") {
    val k = 64
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    def u(id: Long): Double =
      (((id % 2147483648L) * 1103515245L + 12345L) % 2147483647L + 1L)
        .toDouble / 2147483648.0
    val byType = ev.groupBy(_._1)
    val out = Sketches.bottomkSample(spark, sf).collect()
    byType.foreach { case (t, rows) =>
      val sorted = rows.map(r => (u(r._2), r._2)).sortBy(identity).take(k)
      val gotT = out.filter(_.getString(0) == t).sortBy(_.getInt(1))
      assert(gotT.length == math.min(k, rows.length), s"$t sample size")
      gotT.zip(sorted).zipWithIndex.foreach { case ((g, (uu, id)), i) =>
        assert(g.getInt(1) == i + 1 && g.getLong(2) == id &&
          g.getDouble(3) == uu, s"$t rank ${i + 1}")
      }
      val n = rows.length
      val want = if (n <= k) n.toDouble else (k - 1).toDouble / sorted(k - 1)._1
      gotT.foreach { g =>
        assert(g.getDouble(4) == want, s"$t est")
        assert(g.getLong(5) == n.toLong, s"$t n_events")
      }
      val relErr = math.abs(want - n) / n
      info(f"$t: est $want%.1f vs exact $n (rel err $relErr%.3f)")
      // KMV standard error ~ 1/sqrt(k-2) ~ 0.13 at k=64; 3x bound
      assert(relErr < 0.39, s"$t estimator escaped its 3-sigma bound")
    }
    // MERGEABILITY — the property that makes bottom-k a sketch: the
    // union's bottom-k equals the merge of per-shard bottom-ks
    byType.foreach { case (t, rows) =>
      def bk(ids: Seq[Long]) = ids.map(id => (u(id), id)).sorted.take(k)
      val (a, b) = rows.map(_._2).toSeq.partition(_ % 2 == 0)
      assert((bk(a) ++ bk(b)).sorted.take(k) == bk(rows.map(_._2).toSeq),
        s"$t bottom-k not mergeable")
    }
    // BOUNDARY: k above every stratum size -> everything sampled, the
    // estimate coalesces to the exact count
    val all = Sketches.bottomkSample(spark, sf, k = ev.length + 10)
      .collect()
    assert(all.length == ev.length, "k >= n samples everything")
    all.foreach { r =>
      assert(r.getDouble(4) == r.getLong(5).toDouble,
        "under-full stratum must report the exact count") }
  }

  test("ams f2: exact in-memory recompute of signs, sums, median and error") {
    val rows = 9
    val ids = Tables.events(spark, sf).select(col("user_id")).collect()
      .map(_.getLong(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sign(id: Long, r: Int): Long = {
      val nib = "0123456789abcdef".indexOf(md5hex(id.toString)(r)).toLong
      1L - 2L * (nib % 2)
    }
    val sums = (0 until rows).map(r => ids.map(sign(_, r)).sum)
    val ests = sums.map(s => s * s)
    val f2Est = ests.zipWithIndex.sortBy(identity).apply(rows / 2)._1
    val counts = ids.groupBy(identity).values.map(_.length.toLong)
    val f2Exact = counts.map(c => c * c).sum
    val errPct = math.abs(f2Est - f2Exact) * 100L / f2Exact
    val got = Sketches.amsF2(spark, sf).collect()
    assert(got.length == rows)
    got.foreach { g =>
      val r = g.getInt(0)
      assert(g.getLong(1) == sums(r), s"row $r sum")
      assert(g.getLong(2) == ests(r), s"row $r est")
      assert(g.getLong(3) == f2Est, "median estimate")
      assert(g.getLong(4) == f2Exact && g.getLong(5) == counts.size)
      assert(g.getLong(6) == errPct, "integer err pct")
    }
    // MERGEABILITY — the sketch property: per-shard row sums add to
    // the global row sums (what the streaming twin's state relies on)
    val (a, b) = ids.partition(_ % 2 == 0)
    (0 until rows).foreach { r =>
      assert(a.map(sign(_, r)).sum + b.map(sign(_, r)).sum == sums(r),
        s"row $r not mergeable") }
    // the estimator should land in the right ballpark (median-of-9
    // AMS has stddev ~ F2 * sqrt(2) / 3; this corpus measured ~0.3)
    info(s"f2 est $f2Est vs exact $f2Exact (err ${errPct}%)")
    assert(errPct < 200, "estimator wildly off — sign derivation broken?")
  }

}
