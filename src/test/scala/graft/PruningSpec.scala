package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence that scans prune: predicate pushdown reaches the parquet
  * reader, projections narrow ReadSchema, and partitioned layouts get
  * partition-level pruning — the properties SURVEY.md §5 relies on.
  */
class PruningSpec extends AnyFunSuite {
  import TestSession._

  test("filters and projection push into the parquet scan") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      scan)
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), scan)
  }

  // Allowlists shared by the sf0.001 and sf0.1 plan gates below — ONE
  // adjudication record, checked at two data scales (a stats-driven
  // join flip that only appears past the broadcast thresholds is
  // invisible at spec scale; geo_knn's anti-join SMJ was exactly that).
  //
  // broadcast nested-loop is the intended plan where a dimension-sized
    // side is crossed against the big side on purpose: brute/IVF ANN
    // scoring (queries/seeds x candidates); geo_area_assign (polygon
    // containment has no equi key; the area table is broadcast);
    // geo_nearest_poi / geo_route_nearest: only remaining cross is the
    // <=4-row poi-type dim that keeps unreachable (origin|src, type)
    // pairs present — the candidate search itself is the cell-bucketed
    // hash join (asserted below) / the aggregated route matrix
    // emb_cluster_assign / emb_kmeans: every vector scores against the
    // broadcast seed/centroid set by design (k-means assignment step)
    // q31_range_lookup: banded lookup against an 8-row broadcast tier dim
    // (per-row map-side scan of 8 tiers — the correct plan; see Warehouse)
    // geo_eta_matrix: the poisInBuffer bbox pre-filter crosses the POI
    // scan with a ONE-row scalar bbox frame (agg over origins) — the
    // search itself stays the cell-bucketed hash join
    // text_tfidf / text_xentropy: the one-row scalar N/total frames
    // (corpus doc count / token total) crossed onto the per-doc frame;
    // since r12 the term/DF counts themselves arrive through vocab-keyed
    // HASH joins onto map-side-combined count ladders — only the scalar
    // denominators cross
    // emb_neardup_lsh: the contract verdict crosses the ONE-row exact
    // pair-count aggregate onto the one-row LSH aggregate
    // graph_triangles / sketch_heavy_hitters: the one-row max-key /
    // total-count scalar frame crossed onto the edge / candidate frame
    // ann_ivfpq_topk: queries x cell seeds (the probe routing) and the
    // per-query ADC lookup table are dim-sized broadcast crosses; the
    // candidate scan itself is the broadcast-hash probe join
    // q35_gap_fill: the dense spine is (distinct priorities) x (day
    // dim), both broadcast — the fact table never crosses anything
    // ann_ivfpq_trained: the same declared probe-routing and LUT
    // crosses as ann_ivfpq_topk, fed by the trained codebook
    // ann_index_persist: shares ivfPqTopKWith with ann_ivfpq_topk /
    // ann_ivfpq_trained — identical declared probe-routing (queries x
    // cell seeds) and per-query ADC LUT broadcast crosses; only the
    // codebook source differs (persisted artifact vs in-line fit)
    // rag_retrieve_topk: the same declared probe-routing (query table x
    // corpus cell seeds) and LUT crosses over the two-table split; the
    // scoped candidate probe itself is the (cell, label) hash join
    // rag_mmr_rerank: inherits rag_retrieve_topk's declared crosses in
    // its retrieval stage; everything MMR adds is qid-keyed hash
    // joins + max_by partial aggs over queries x k frames
    // rag_context_pack: inherits the same through its rag_mmr_rerank
    // input; the pack itself is one broadcast join + one window
    // rag_recall_eval / rag_ndcg_eval: inherit the retrieval crosses;
    // the truth arm is a label-keyed broadcast HASH join + k-heap,
    // eval joins output-sized
    // rag_index_refresh: the arrivals x base-seeds coarse-assignment
    // cross (the emb_cluster_assign declared shape) over the delta
    // rag_index_sync: the same declared coarse-assignment cross (base
    // build + changed-row re-encode, both x broadcast fixed seeds)
    val nlAllowed = Set("ann_brute_topk", "ann_ivf_topk", "ann_ivfpq_topk",
      "ann_ivfpq_trained", "ann_index_persist", "rag_retrieve_topk",
      "rag_mmr_rerank", "rag_context_pack", "rag_recall_eval",
      "rag_ndcg_eval", "rag_index_refresh", "rag_index_sync",
      "geo_nearest_poi", "geo_area_assign", "geo_route_nearest",
      "emb_cluster_assign", "emb_kmeans", "q31_range_lookup",
      "geo_eta_matrix", "text_tfidf", "text_xentropy", "emb_neardup_lsh",
      "graph_triangles", "graph_jaccard", "sketch_heavy_hitters",
      "q35_gap_fill",
      // geo_isochrone: band spine (sources x 6-row bin dim) and the
      // one-row total-nodes scalar are intentional broadcast crosses
      // sketch_countmin: the one-row total-events scalar for the
      // Markov-bound verdict crosses the per-user estimate frame
      // sketch_ams_f2: the one-row median-estimate and exact-F2 scalar
      // frames crossed onto the 9-row sketch frame by design
      // emb_diversity_sample: each greedy round folds the one-row
      // chosen-center frame into the state map-side by design
      "geo_isochrone", "sketch_countmin", "sketch_ams_f2",
      "emb_diversity_sample",
      "pipeline_dedup_sample",
      // emb_outliers: the one-row corpus mean/stddev scalar frame is
      // folded onto the distance frame map-side by design
      "emb_outliers",
      // q36_merge_upsert: the one-row max-key scalar frame crossed onto
      // the insert-clause change rows (the merge join itself is the
      // asserted shuffle-hash equi-join)
      "q36_merge_upsert",
      // q52_snapshot_diff: the same one-row max-key scalar cross as
      // q36 builds its insert clause (the diff classify join is the
      // asserted shuffle-hash full outer)
      "q52_snapshot_diff",
      // q55_snapshot_compact: the one-row churn-path conservation
      // count crossed onto the one-row pruned-path aggregate (both
      // single rows, the q51 pattern)
      "q55_snapshot_compact",
      // q59_snapshot_zorder: the same one-row box-aggregate x one-row
      // conservation-count cross (z-pruned path vs linear path)
      "q59_snapshot_zorder",
      // text_collocations: the two one-row corpus-total scalars crossed
      // onto the surviving bigram frame (unigram counts join VOCAB-KEYED)
      "text_collocations",
      // emb_pca: the one-row mean-array / n / norm / Rayleigh scalar
      // frames crossed onto dims-sized frames by design — nothing
      // corpus-sized ever meets a nested loop
      "emb_pca",
      // q43: the one-row float-pinned avg-balance scalar crossed onto
      // the code-filtered customers (the anti join is the asserted
      // hash join)
      "q43_dormant_customers",
      // ann_recall_eval composes bruteTopK + ivfTopK, inheriting their
      // declared query x candidate crosses; the eval itself is an
      // output-sized semi join
      "ann_recall_eval",
      // text_perplexity: the one-row vocabulary-size scalar (the add-k
      // smoothing denominator) crossed onto the bigram frame by design
      "text_perplexity",
      // sketch_hll_union: the one-row exact-all-users scalar crossed
      // onto the one-row unioned-sketch estimate (both single rows)
      "sketch_hll_union",
      // q44: the one-row global-max-revenue scalar crossed onto the
      // per-supplier revenue view (the supplier dim join is the
      // broadcast-hash equi-join)
      "q44_top_supplier",
      // pipeline_ram_e2e: the work-area interval join (origins vs the
      // broadcast admin x cell dim — containment has no equi key, the
      // geo_area_assign posture) and the <=4-row poi-type cross it
      // inherits from geo_nearest_poi
      "pipeline_ram_e2e",
      // emb_dim_recall: inherits ann_brute_topk's declared broadcast
      // queries x candidates cross, once per dims variant
      "emb_dim_recall",
      // ann_range_search: the same declared queries x candidates cross
      // (range scan is the threshold twin of the brute top-k)
      "ann_range_search",
      // ann_ivf_stats: the seed-assignment cross (emb_cluster_assign's
      // declared shape) + the one-row corpus-total scalar
      "ann_ivf_stats",
      // text_temperature_mix: the one-row budget and weight-total
      // scalar frames crossed onto the doc scan (weights themselves
      // join source-keyed)
      "text_temperature_mix",
      // geo_tile_roads: inherits roadEdges' one-row node-count scalar
      // cross (the same frame geo_route_eta consumes behind its
      // checkpoint); the clip itself is pure map-side arithmetic
      "geo_tile_roads",
      // sketch_theta_intersect: the two one-row KMV sketch frames and
      // the one-row exact-intersection scalar meet in declared one-row
      // broadcast crosses — the sketch passes themselves are partial
      // aggs, nothing row-sized ever crosses
      "sketch_theta_intersect",
      // (ann_filtered_topk needs no exception: its label-equality
      // candidate join and rank->label re-join both plan broadcast HASH)
      // emb_incremental: inherits the seed-assignment cross
      // (emb_cluster_assign's declared shape) on both the corpus
      // routing and the batch probe sides
      "emb_incremental",
      // text_lm_heldout: text_perplexity's declared one-row train-vocab
      // scalar cross (the add-k smoothing denominator)
      "text_lm_heldout",
      // text_classifier_train: the one-row doc-count scalar (the mean-
      // gradient denominator) crossed onto the gradient agg each round;
      // weights broadcast HASH into scoring, errors shuffle-hash by doc
      "text_classifier_train",
      // ann_hybrid_rrf: the one-row corpus-stats scalar (N, avgdl)
      // crossed onto the postings frame, plus the inherited brute
      // queries x candidates cross on the dense side; the lexical
      // candidate join itself is the broadcast HASH join on term
      "ann_hybrid_rrf",
      // q45_ks_test / text_drift: the one-row sample-totals scalar
      // crossed onto the per-value / per-term frame (ECDF and
      // frequency denominators)
      "q45_ks_test", "text_drift",
      // q46_psi: the one-row totals scalar (slice sizes + bin count,
      // the smoothing denominators) crossed onto the bins-sized frame
      "q46_psi",
      // ann_hard_negatives: the mining join's predicate is label
      // INEQUALITY — not an equi key by construction — so the broadcast
      // nested loop over the broadcast query set IS the declared plan
      // (same class as bruteTopK's all-pairs scoring cross)
      "ann_hard_negatives",
      // text_bpe_train: each round fuses via the one-row winning-pair
      // frame broadcast-crossed onto the vocab histogram
      "text_bpe_train",
      // sketch_bloom: the one-row probe-summary and bits-set scalars
      // meet in declared one-row broadcast crosses; the probe itself is
      // the broadcast HASH join against the bounded built-filter set
      "sketch_bloom",
      // sketch_bloom_merge: the per-shard/merged/overlap one-row bit
      // counts meet in declared scalar crosses; probe is broadcast HASH
      "sketch_bloom_merge",
      // text_bpe_apply: inherits text_bpe_train's per-round one-row
      // winning-pair crosses; the metering join itself is the
      // vocabulary-sized broadcast HASH join
      "text_bpe_apply",
      // ann_ndcg_eval: inherits bruteTopK's scoring cross and
      // ann_ivf_topk's probe-routing cross; the eval joins are
      // output-sized broadcasts
      "ann_ndcg_eval",
      // q48_data_contract: the one-row per-table rule aggregates meet
      // in declared scalar crosses before the map-side unpivot
      "q48_data_contract",
      // emb_pca_project: inherits emb_pca's declared one-row norm
      // cross in the live (post-checkpoint) eigenvector plan
      "emb_pca_project",
      // geo_snap_roads: the one-row node-count scalar (segment ring
      // modulus) crosses the supplier dim; matching itself is the
      // broadcast HASH cell-cover join
      "geo_snap_roads",
      // text_zipf: the one-row OLS-sums and vocab-totals scalars meet
      // in a declared one-row broadcast cross
      "text_zipf",
      // emb_rq_codes: both quantization stages score against broadcast
      // seed codebooks (the emb_cluster_assign declared shape)
      "emb_rq_codes",
      // text_dsir_weights: the one-row token-totals scalar (the two
      // Laplace denominators) crossed onto the 256-row stats frame
      "text_dsir_weights",
      // ann_binary_topk: bruteTopK's declared broadcast queries x
      // candidates cross, at 1/32 the scan bytes (bit signatures)
      "ann_binary_topk",
      // text_kn_perplexity: the one-row bigram-type-total scalar (the
      // continuation-probability denominator) crossed onto the stream
      "text_kn_perplexity",
      // text_ppl_buckets: the corpus-count and two tercile-threshold
      // one-row scalars crossed onto the per-doc nll frame (plus
      // text_perplexity's declared vocab-size scalar upstream)
      "text_ppl_buckets",
      // graph_modularity: the one-row edge-total scalar crossed onto
      // the community rollup (plus ccEdges' declared nv scalar)
      "graph_modularity",
      // graph_degree_dist: consumes ccEdges, inheriting its declared
      // one-row nv scalar cross (Graph.scala ccEdges — the same
      // adjudication as graph_modularity); the degree histogram itself
      // is a pure two-level hash agg
      "graph_degree_dist",
      // ann_nprobe_sweep: per-arm one-row hit x scanned scalar crosses
      // on top of the declared brute/ivf broadcast query crosses
      "ann_nprobe_sweep",
      // q51_skew_report: per-key one-row totals scalar crossed onto the
      // (tiny) key-size histogram
      "q51_skew_report",
      // emb_cluster_quality: the kxk centroid separation self-cross
      // (seed-count-sized, corpus-independent) plus the declared
      // emb_cluster_assign broadcast-seed assignment
      "emb_cluster_quality")
    // full-outer equi-joins cannot broadcast (both sides must preserve
    // unmatched rows), so a shuffle join IS the correct plan there;
    // ann_hybrid_rrf's RRF fusion joins the two rank lists FULL OUTER
    // (a candidate may appear in either list alone) — same class.
    // emb_mutual_knn's mutuality cut is a self semi-join of the n x k
    // directed edge list against its own transpose: BOTH sides are
    // corpus-sized at scale, so the shuffle join is the plan you want
    // emb_semantic_communities / emb_centrality compose emb_mutual_knn,
    // inheriting the declared mutuality-cut shuffle join
    val smjAllowed = Set("q26_full_outer", "ann_hybrid_rrf",
      "emb_mutual_knn", "emb_semantic_communities", "emb_centrality")
  // Accumulate EVERY violation before asserting: a fail-fast gate let
  // one missed allowlist entry shadow another for a full round (r11's
  // ann_index_persist miss hid graph_degree_dist's until r12).
  private def planViolations(dir: String): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      Seq(
        if (plan.contains("CartesianProduct"))
          Some(s"$name plans a cartesian product") else None,
        if (!smjAllowed.contains(name) && plan.contains("SortMergeJoin"))
          Some(s"$name plans a sort-merge join") else None,
        if (!nlAllowed.contains(name) && plan.contains("BroadcastNestedLoopJoin"))
          Some(s"$name plans an unexpected broadcast nested-loop join") else None
      ).flatten
    }

  test("no query plans a cartesian product or sort-merge join, except the declared broadcast-NL cases") {
    val violations = planViolations(sf)
    assert(violations.isEmpty, s"${violations.size} plan-gate violations:\n" +
      violations.mkString("\n"))
  }

  test("plan shapes hold at sf0.1 — stats-driven join flips surface here, not at spec scale") {
    // the same whole-registry gate against 100x the data: past the
    // broadcast thresholds the planner's stats-blind fallbacks appear
    // (a post-aggregate join side has NO size estimate and falls to
    // sort-merge — geo_knn's anti join did exactly that until hinted)
    val violations = planViolations("/root/testdata/sf0.1")
    assert(violations.isEmpty,
      s"${violations.size} plan-gate violations at sf0.1:\n" +
      violations.mkString("\n"))
  }

  test("ETA queries search cell-bucketed candidates, not an all-POIs cross") {
    // the POI side must reach the origins through a broadcast HASH join
    // on the grid cell keys (plus poi_type for the per-type search) —
    // per-origin work is then local density, not |POI|
    Seq("geo_nearest_poi" -> operators.Accessibility.nearestPoi(spark, sf),
      "geo_accessibility" -> operators.Accessibility.accessibility(spark, sf))
      .foreach { case (name, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"),
          s"$name lost its cell-bucketed candidate join:\n$plan")
      }
    // accessibility has a single POI type: no density cross remains at all
    val acc = operators.Accessibility.accessibility(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!acc.contains("BroadcastNestedLoopJoin"),
      "geo_accessibility should not cross origins with anything")
  }

  test("text operators read only the columns they use from documents") {
    // the documents scan must prune to (doc_id, text) — reading lang/
    // source/n_chars for a shingle pipeline is wasted IO at 100 TB
    // (name, query, columns that must never reach its scans: unused
    // document metadata for the text ops, the label column for the
    // embeddings ops)
    Seq(
      ("decontaminate", operators.TextAnalysis.decontaminate(spark, sf),
        Seq("lang", "source")),
      ("bigrams", operators.TextAnalysis.bigrams(spark, sf),
        Seq("lang", "source")),
      ("repetition", operators.TextAnalysis.repetition(spark, sf),
        Seq("lang", "source")),
      ("minhash", operators.Dedup.minhashCandidates(spark, sf),
        Seq("lang", "source")),
      ("cluster_assign", operators.Similarity.clusterAssign(spark, sf),
        Seq("label")),
      ("kmeans", operators.Similarity.kmeans(spark, sf, iters = 1),
        Seq("label")),
      ("tfidf", operators.TextAnalysis.tfidf(spark, sf),
        Seq("lang", "source")),
      ("xentropy", operators.TextAnalysis.xentropy(spark, sf),
        Seq("lang", "source")),
      ("weighted_sample", operators.TextAnalysis.weightedSample(spark, sf),
        Seq("lang", "source")),
      ("pq_codes", operators.Similarity.pqCodes(spark, sf),
        Seq("label"))
    ).foreach { case (name, df, forbidden) =>
      val plan = df.queryExecution.executedPlan.toString
      val readSchemas = "ReadSchema: struct<([^>]*)>".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      assert(readSchemas.nonEmpty, s"$name: no parquet scan found")
      readSchemas.foreach { s =>
        forbidden.foreach(c => assert(!s.contains(c),
          s"$name reads unused column $c: $s"))
      }
    }
  }

  test("partitioned write prunes partitions at read time") {
    val path = "target/tmp-sources/events_by_type"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(path)
    val df = spark.read.parquet(path).filter(col("event_type") === "click")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    // only the click partition is actually read
    val all = spark.read.parquet(path).count()
    val clicks = df.count()
    assert(clicks > 0 && clicks < all)
  }
}
