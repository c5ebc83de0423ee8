#!/usr/bin/env python3
"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Protocol (BASELINE.md notes): one shared SparkSession amortizes the ~6 s
startup; every query runs once for codegen/JIT warmup and then BEST-OF-3
steady-state is reported — single steady-state runs swung ±15-40% with VM
timing noise (round-2 verdict #4), which masked real regressions; the
minimum of three is the stable engine-cost estimator. Failures are
skipped, not fatal (the reference's own ``async_serial_ignore`` pattern,
src/processor.ts:149-161).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import traceback

from hive_processor_spark import get_spark, queries

#: Headline set: the BASELINE.md shapes plus one representative per
#: operator family that matters at scale.
HEADLINE = [
    "agg_groupby",        # Q1 scan+group agg
    "join_multiway",      # Q3 3-way join + topk
    "win_topk_group",     # window top-k per group
    "stream_tumbling",    # event-time rollup (ns ingestion incl.)
    "sim_cosine_pairs",   # all-pairs cosine top-10
    "join_asof",          # union+window as-of join
    "stream_session",     # session windows
    "dedup_ngram_jaccard",  # shingle self-join dedup
    "text_wordcount",     # explode+count
    "fn_math",            # wide scalar projection
    "join_broadcast",     # broadcast dim join
    "agg_rollup",         # grouping-set aggregate
    "stream_gapfill",     # dense-grid time-series rollup
    "agg_salted_skew",    # two-phase salted aggregation
    "dedup_simhash_pairs",  # banded simhash candidate join
    "pipeline_clean_corpus",  # composed quality->dedup->stats pipeline
    "embed_quantize",     # int8 embedding quantization scan
    "events_funnel",      # per-user funnel aggregation
    "text_contamination",  # benchmark n-gram overlap (broadcast bench side)
    "events_anomaly",     # z-score outliers (stats broadcast back)
    "sketch_countmin",    # distributed count-min sketch build + probe
    "embed_kmeans",       # bit-stable 2-iteration Lloyd clustering
    "tpch_q21_waiting_supplier",  # multi-probe decision-support composite
    "ml_linreg",          # sufficient-stats OLS fit
    "basket_pairs",       # order-basket self-join association rules
    "stats_mad_outliers",  # two-pass exact median/MAD robust outliers
    "embed_outliers",     # centroid-distance embedding outlier sweep
    "text_bm25",          # BM25 retrieval scoring over the corpus
    # round-3 additions
    "join_bloom_prefilter",  # codegen bloom bitmap semi-join reduction
    "embed_binary_quantize",  # 1-bit pack + Hamming retrieval
    "ml_ndcg",            # quantized NDCG@10 ranking metric
    "events_retention_curve",  # cohort retention triangle
    "ab_cuped_adjust",    # CUPED variance reduction (user-keyed + broadcast theta)
    "sim_precision_at_k",  # broadcast-probe retrieval grading (window top-k)
    "ml_nearest_centroid",  # exploded-dim Rocchio classifier + F1
    "join_range_binned",  # band join via bin+residual equi-join rewrite
    # continuation-2 additions
    "ml_naive_bayes",     # counts-table NB train + inference join
    "join_spatial_dbscan",  # grid-cell equi-join density clustering
    "dedup_lsh_tuning",   # one signature set re-sliced by 4 band configs
    "ml_kfold_cv",        # total-minus-fold mergeable-stats CV
    # round-4 additions
    "stats_kruskal_wallis",  # grouped-by-value k-sample rank test
    "sketch_kmv_distinct",   # k-minimum-values distinct sketch
    "graph_hits_bipartite",  # integer-quantized HITS power sweeps
    "text_collocation_llr",  # Dunning LLR collocation mining
    "fn_trigram_similarity",  # PPJoin prefix-filtered trigram join
    "embed_kcenter_coreset",  # 8-round farthest-point traversal
    # round-4 session-2 additions
    "stats_anderson_darling",  # rank-frame A2 + chunk-stitched harmonic prefix
    "embed_anisotropy",   # O(n*d) pair-free mean-cosine via ||sum(u)||^2
    "win_distinct_sliding",  # sliding COUNT(DISTINCT) interval sweep
    "sketch_hll_intersection",  # register-MAX HLL set algebra
    "market_price_index",  # matched-basket bilateral price indexes
    # round-7 additions
    "stats_ad_ksample",   # k-sample AD: grid fold + harmonic block fold
    "graph_anf_hyperball",  # per-node HLL ball sketches, BSP max-merge
    "ml_bradley_terry",   # basket duels -> quantized MM strength fit
    # round-7 session-2 additions
    "dedup_semantic",     # SemDeDup cell kernel + clone collapse
    "ts_holt_winters",    # integer recurrence smoother (applyInPandas)
    "pipeline_dsir_weights",  # hashed-bigram importance weights
    # round-8 representatives: the rewritten heavy dedup/ANN paths plus
    # the new filter battery — the queries this round's perf work targets
    "sim_ann_join",           # SQL-signature LSH join, verify-in-bucket
    "dedup_ngram_verify",     # prefix-filter candidates + exact verify
    "text_gopher_rules",      # quality-filter rule battery
    "dedup_substring_spans",  # repeated 20-token span detection
    # round-10 representatives: the session-pinned ANN/perplexity planes,
    # the wedge-count on the pinned simhash class graph, the driver-side
    # boost-round rewrite, and a promoted engine-mirrorable sketch
    "sim_ann_pq",             # PQ ADC shortlist + exact rerank (pinned codebooks)
    "pipeline_perplexity_buckets",  # CCNet terciles off the pinned ppl frame
    "graph_triangles",        # twin-collapsed wedge count (pinned class graph)
    "ml_gradient_boost_stumps",  # histogram boosting, driver round loop
    "agg_approx_distinct",    # KMV distinct sketch (Tier-H since round 10)
    # round-11 representatives: the lambda re-split fix, the pinned LOF
    # kNN frame and daily-revenue spine, and the winnowing wave flagship
    "text_good_turing",       # bigram fof smoothing (array-indexed lambda)
    "profile_lof_outliers",   # LOF over the pinned exact 10-NN list
    "ts_arch_lm",             # ARCH LM off the pinned daily-revenue spine
    "dedup_winnowing",        # MOSS winnowing fingerprints, guarantee-exact
    "win_exclude_current",    # SQL frame-exclusion emulation (LOO mean)
    # round-11 OPTIMIZATION representatives: the folded quantile probes,
    # the two-level exact-kNN candidate kernel, the numpy anchor/query
    # similarity kernels, and the histogram-median rewrite
    "agg_hdr_histogram",      # quantile probes folded into one aggregate
    "agg_mean_excess",        # same probe fold, two stages
    "sim_rrf_fusion",         # un-nested rank passes, bounded grids
    "stats_blomqvist_beta",   # histogram medians replace percentile_disc
    "embed_hubness",          # two-level exact kNN candidate kernel
]


#: Queries whose per-query sweep numbers are ORDER-DEPENDENT because they
#: share a session pin (BENCH_VARIANCE.md, round-8 note): the first family
#: member to run pays the pin derivation; later members read it nearly
#: free. The committed artifact therefore carries each family's TOTAL —
#: the only order-independent attribution — next to the per-query lines.
#: Keep in sync with the *_pinned helpers (similarity.py, dedup.py,
#: graphs.py) and the streaming replay memo (streaming/smoke.py).
PINNED_FAMILIES = {
    "cosine_pair_plane": [
        "dedup_cluster",
        "embed_neardup",
        "graph_cc_size_dist",
    ],
    "ngram_pair_plane": [
        "dedup_cluster_docs",
        "dedup_keep_best",
        "dedup_recall_report",
        "dedup_threshold_sweep",
    ],
    "knn_edges": [
        "graph_anf_hyperball",
        "graph_assortativity",
        "graph_bfs_levels",
        "graph_clustering_coeff",
        "graph_label_conductance",
        "graph_label_modularity",
        "graph_label_propagation",
        "graph_matmul_2hop",
        "graph_rich_club",
    ],
    "simhash_pair_plane": [
        "graph_degree",
        "graph_kcore",
        "graph_link_predict",
        "graph_pagerank",
    ],
    "ann_plane": [
        "sim_ann_join",
        "sim_ann_lsh",
        "sim_ann_pq",
    ],
    "bigram_ppl_plane": [
        "pipeline_perplexity_buckets",
        "text_bigram_perplexity",
    ],
    "lof_knn_plane": [
        "profile_lof_outliers",
    ],
    "purchase_edges": [
        "graph_hits_bipartite",
        "graph_katz_paths",
    ],
    "shingle_index": [
        "dedup_containment",
        "dedup_ngram_jaccard",
    ],
    "daily_rev_plane": [
        "stats_durbin_watson",
        "ts_arch_lm",
        "ts_cusum_squares",
        "ts_ljung_box",
        "ts_sample_entropy",
    ],
    "stream_replay": [
        "stream_cdc_apply",
        "stream_dlq_route",
        "stream_late_data",
        "stream_micro_batch",
        "stream_session_window",
        "stream_stateful",
        "stream_static_join",
        "stream_stream_join",
        "stream_stream_left_join",
        "stream_topk_merge",
    ],
}


def main() -> int:
    full = "--full" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    # BASELINE.md bench guidance: 8 shuffle partitions at sf<=0.1 — the
    # fixtures fit in L3 and per-task overhead dominates; larger sf keeps
    # the engine default (AQE re-coalesces at runtime either way).
    shuffle = 8 if (sf is not None and sf <= 0.1) else None
    spark = get_spark(
        app_name="hive-processor-spark-bench", shuffle_partitions=shuffle
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def run(name: str) -> None:
        # noop sink: executes the full physical plan distributed, without
        # funneling the result through py4j row serialization — wide
        # projections would otherwise bench the driver pipe, not the engine.
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # --full: steady-state time EVERY registered query (verdict r3 #7 —
    # regressions outside the 40-query headline set must not hide). One
    # session, warmup + best-of-2 (enough: headline best-of-3 covers the
    # publication numbers; this is the long-tail regression radar).
    names = sorted(qs) if full else HEADLINE
    reps = 2 if full else 3

    # r12 (r11 verdict item 7): record machine load and per-query rep
    # spreads so a reader can separate contention from regression
    # mechanically. ADDITIONS ONLY — every pre-existing key (including
    # each `queries` entry = best-of-N) is computed exactly as before.
    load_before = list(os.getloadavg())
    per_query: dict[str, float] = {}
    per_query_reps: dict[str, list[float]] = {}
    failed: list[str] = []
    for name in names:
        try:
            run(name)  # warmup: codegen + JIT
            best = float("inf")
            rep_times: list[float] = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run(name)
                dt = time.perf_counter() - t0
                rep_times.append(round(dt, 3))
                best = min(best, dt)
            per_query[name] = round(best, 3)
            per_query_reps[name] = rep_times
        except Exception:
            failed.append(name)
            traceback.print_exc(file=sys.stderr)
            continue
    total = round(sum(per_query.values()), 3)
    out = {
        "metric": "full_registry_steady_state" if full else "headline_suite_steady_state",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "load_avg_before": load_before,
        "load_avg_after": list(os.getloadavg()),
        "query_reps": per_query_reps,
    }
    if full:
        worst = sorted(per_query.items(), key=lambda kv: -kv[1])[:20]
        out["worst_20"] = dict(worst)
        out["n_queries"] = len(per_query)
        out["failed"] = failed
        # order-independent attribution for the pin-sharing families
        out["pinned_family_totals"] = {
            fam: round(sum(per_query.get(q, 0.0) for q in members), 3)
            for fam, members in PINNED_FAMILIES.items()
        }
        out["pinned_family_members"] = {
            fam: [q for q in members if q in per_query]
            for fam, members in PINNED_FAMILIES.items()
        }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
