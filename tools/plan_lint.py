"""Registry-wide physical-plan lint: catch scale anti-patterns at sf0.001.

Rules (each with an explicit allowlist — an entry there is a *reviewed*
exception, not a pass):

- ``CartesianProduct``: an unconstrained n×m join is never the plan you
  want at 100 TB. Allowed only where the operator's semantics are a true
  cross join (``join_cross``) — broadcast nested-loop joins (bounded build
  side) do NOT trigger this rule.
- ``BatchEvalPython`` (row-at-a-time Python UDF): the slow path; allowed
  only in the queries that exist to prove that surface.
- ``InMemoryTableScan`` outside the cache-plane queries: caching inside an
  operator hides its real cost from the bench and can pin executor memory
  at scale. (``localCheckpoint``/persist produce RDD scans, not
  InMemoryTableScan, so layout pinning stays allowed.)
- **Unbounded global window** (round-5 verdict #5): a ``Window`` with an
  empty partition spec moves its whole input through ONE partition — the
  defect class behind ``profile_iqr_outliers`` (round 4) and
  ``events_conversion_lag`` (round 5). A global window is fine only when
  its input frame is bounded: mechanically proven when the window's tree
  child is a TakeOrderedAndProject / limit, otherwise a reviewed
  allowlist entry must name the bounded frame (day/month/dim/histogram
  cardinality) the window runs over.

Usage:
    python -m tools.plan_lint            # lint every oracle-backed query
    python -m tools.plan_lint name ...   # lint specific queries
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

from hive_processor_spark import get_spark, oracles, queries
from hive_processor_spark.plans import plan_string

SF_SMALL = "/root/testdata/sf0.001"

#: query -> reviewed reason
CARTESIAN_OK = {
    "join_cross": "the operator IS a cross join (bounded 25x5 dims)",
}
PY_UDF_OK = {
    "udf_python": "exists to prove the row-at-a-time UDF surface",
    "udf_registered_sql": "SQL-registered Python UDF surface",
    "udtf_python": "Python UDTF surface",
    "udtf_table_partition": "partitioned UDTF surface",
    "udtf_polymorphic": "analyze-time-schema UDTF surface (round-11)",
}
CACHE_SCAN_OK = {
    "cache_table": "the operator proves the cache plane",
    "cache_broadcast_lookup": "the operator proves the cache plane",
    "basket_pairs": (
        "deliberate persist(): one basket build reused by three consumers;"
        " lineage-backed (round-2 verdict item 6), LRU-evictable"
    ),
    "dedup_lsh_tuning": (
        "deliberate persist(): one MinHash signature build re-sliced by"
        " four band configs; lineage-backed, LRU-evictable"
    ),
    "embed_neardup": (
        "session-pinned 0.4-cosine near-dup pair frame shared with"
        " dedup_cluster and graph_cc_size_dist (round-7 verdict item 4);"
        " lineage-backed, LRU-1"
    ),
    "dedup_cluster": (
        "consumes the session-pinned 0.4-cosine near-dup pair frame"
        " (shared with embed_neardup); lineage-backed, LRU-1"
    ),
    "graph_cc_size_dist": (
        "consumes the session-pinned 0.4-cosine near-dup pair frame"
        " (shared with embed_neardup); lineage-backed, LRU-1"
    ),
    "dedup_cluster_docs": (
        "consumes the session-pinned n-gram Jaccard pair frame and"
        " labeling (shared with dedup_recall_report / dedup_keep_best);"
        " lineage-backed, LRU-1"
    ),
    "dedup_recall_report": (
        "consumes the session-pinned n-gram Jaccard pair frame;"
        " lineage-backed, LRU-1"
    ),
    "dedup_keep_best": (
        "consumes the session-pinned n-gram Jaccard pair frame and"
        " labeling; lineage-backed, LRU-1"
    ),
    "dedup_threshold_sweep": (
        "consumes the session-pinned n-gram Jaccard pair frame"
        " (five threshold slices of one materialization); lineage-backed"
    ),
    "graph_label_modularity": (
        "deliberate persist(): one derived 3-NN edge list reused by both"
        " label-join sides; lineage-backed"
    ),
    "graph_assortativity": (
        "deliberate persist(): one derived 3-NN edge list reused as the"
        " edge stream and both degree-join sides; lineage-backed"
    ),
    "graph_matmul_2hop": (
        "deliberate persist(): one derived 3-NN edge list reused as both"
        " matmul operands and the direct-edge probe; lineage-backed"
    ),
    "graph_label_conductance": (
        "deliberate persist(): the session-pinned 3-NN edge list reused"
        " by both label-join sides and the volume reduction; lineage-backed"
    ),
    "graph_rich_club": (
        "deliberate persist(): the session-pinned 3-NN edge list reused"
        " as the edge stream and both endpoint-degree sides; lineage-backed"
    ),
    "graph_clustering_coeff": (
        "deliberate persist(): one derived 3-NN edge list reused by the"
        " degree, wedge, and closure consumers; lineage-backed, LRU-evictable"
    ),
    "graph_anf_hyperball": (
        "deliberate persist(): the session-pinned 3-NN edge list reused"
        " by all three HyperBall merge sweeps; lineage-backed"
    ),
    "dedup_ngram_jaccard": (
        "its OUTPUT is the session-pinned n-gram pair plane"
        " (_ngram_pairs_pinned persists dedup_ngram_jaccard's frame for"
        " the cluster_docs/keep_best/recall_report family); with the r12"
        " shingle-index pin the query's plan is deterministic within a"
        " session, so once the pair pin is materialized Spark's"
        " CacheManager legitimately substitutes it on re-evaluation —"
        " lineage-backed, LRU-1"
    ),
    "graph_hits_bipartite": (
        "consumes the session-pinned distinct purchase-edge list"
        " (round-12, r11 verdict item 5; shared with graph_katz_paths);"
        " lineage-backed, LRU-1"
    ),
    "graph_katz_paths": (
        "consumes the session-pinned distinct purchase-edge list"
        " (round-12; shared with graph_hits_bipartite); lineage-backed,"
        " LRU-1"
    ),
    "graph_degree": (
        "consumes the session-pinned simhash near-dup pair frame"
        " (round-9, shared with graph_pagerank / graph_kcore /"
        " graph_link_predict); lineage-backed, LRU-1"
    ),
    "graph_link_predict": (
        "consumes the session-pinned simhash near-dup pair frame"
        " (round-9); lineage-backed, LRU-1"
    ),
    "mm_phash_neardup": (
        "deliberate persist(): materialization boundary stops Catalyst"
        " inlining the 64-sample HOF signature into both self-join sides"
        " (measured 30x); lineage-backed, LRU-evictable"
    ),
    "sim_ann_join": (
        "consumes the session-pinned ANN plane (clone collapse + banded"
        " unit-vector signatures, round-10 VERDICT r9 items 1-2);"
        " lineage-backed, LRU-1"
    ),
    "sim_ann_lsh": (
        "consumes the session-pinned ANN plane (raw-vector E2LSH"
        " signatures, round-10); lineage-backed, LRU-1"
    ),
    "sim_ann_pq": (
        "consumes the session-pinned ANN plane (PQ codebooks + corpus"
        " codes, round-10); lineage-backed, LRU-1"
    ),
    "text_bigram_perplexity": (
        "session-pinned bigram cross-entropy frame shared with"
        " pipeline_perplexity_buckets (round-10); lineage-backed, LRU-1"
    ),
    "pipeline_perplexity_buckets": (
        "consumes the session-pinned bigram cross-entropy frame (shared"
        " with text_bigram_perplexity); lineage-backed, LRU-1"
    ),
    "graph_triangles": (
        "consumes the session-pinned collapsed simhash class graph"
        " (classes + hamming class-edges, round-10); lineage-backed, LRU-1"
    ),
    "dedup_ngram_verify": (
        "consumes the session-pinned clone-collapsed shingle-hash array"
        " frame (round-10, VERDICT r9 item 4); lineage-backed, LRU-1"
    ),
    "profile_lof_outliers": (
        "consumes the session-pinned exact 10-NN list (round-11, VERDICT"
        " r10 item 3); answer-shaped (10 rows/point); lineage-backed, LRU-1"
    ),
    **dict.fromkeys(
        [
            "ts_ljung_box",
            "ts_arch_lm",
            "stats_durbin_watson",
            "ts_cusum_squares",
            "ts_sample_entropy",
        ],
        "consumes the session-pinned exact daily-revenue spine (day, x)"
        " (round-11, VERDICT r10 item 4); one row per day; lineage-backed,"
        " LRU-1",
    ),
}

def _load_window_audit() -> dict[str, str]:
    """Allowlist for the UnboundedGlobalWindow rule = MEASURED evidence:
    tools/window_audit.py executes every flagged query at sf0.01 and
    sf0.1 and records the rows actually entering each global window in
    WINDOW_AUDIT.json. Queries whose windows measured `bounded` (or are
    reviewed `saturating` value-domain histograms) are allowed; anything
    new, changed, or measured UNBOUNDED stays flagged until re-audited."""
    path = os.path.join(os.path.dirname(__file__), "..", "WINDOW_AUDIT.json")
    try:
        with open(path) as f:
            report = json.load(f)
    except OSError:
        return {}
    return {
        name: r["verdict"]
        for name, r in report.items()
        if r.get("verdict") in ("bounded", "saturating")
    }


#: query -> measured/reviewed verdict for its global windows
GLOBAL_WINDOW_OK: dict[str, str] = _load_window_audit()

RULES = (
    ("CartesianProduct", CARTESIAN_OK),
    ("BatchEvalPython", PY_UDF_OK),
    ("InMemoryTableScan", CACHE_SCAN_OK),
)

#: Tree-child operators that mechanically bound a global window's input.
_BOUNDED_CHILDREN = re.compile(
    r"TakeOrderedAndProject|GlobalLimit|LocalLimit|CollectLimit"
)


def _arg_group_strs(line: str) -> list[str]:
    """Top-level ``[...]`` group contents in a formatted Arguments line."""
    depth = 0
    groups: list[str] = []
    buf: list[str] = []
    for ch in line:
        if ch == "[":
            if depth == 0:
                buf = []
            else:
                buf.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(buf))
            else:
                buf.append(ch)
        elif depth > 0:
            buf.append(ch)
    return groups


_SORT_TOKEN = re.compile(r"\b(ASC|DESC) NULLS")


def _window_args_unpartitioned(line: str) -> bool:
    """Formatted Window Arguments carry `[exprs], [partition], [order]`,
    but EMPTY specs are omitted from the rendering: 2 groups is either
    partitioned-without-order (`[exprs], [partition]`) or
    global-with-order (`[exprs], [order]`) — disambiguated by the sort
    tokens only an order spec contains.

    Windows ordered on ``_osb`` are exempt: that is the orderstat
    helper's bucket-prefix frame, bounded at n_buckets+1 rows BY
    CONSTRUCTION at any scale (functions/orderstat.py; exactness
    property-tested in tests/test_orderstat.py)."""
    if "_osb#" in line:
        return False
    groups = _arg_group_strs(line)
    if len(groups) >= 3:
        return False
    if len(groups) <= 1:
        return True
    return bool(_SORT_TOKEN.search(groups[1]))


def unbounded_global_windows(plan: str) -> bool:
    """True iff the plan has a Window with no partition spec whose tree
    child is not a limit operator (the moving-all-rows-to-one-partition
    shape, undetectable by a substring match alone).

    Formatted-plan facts this parser relies on: the detail block header
    is ``(N) Window`` and its Arguments line carries the window spec
    lists (see ``_window_args_unpartitioned``); the tree section renders
    the operator as ``... Window (N)`` with its single child on the
    following line.
    """
    lines = plan.splitlines()
    unpart: set[str] = set()
    for i, line in enumerate(lines):
        m = re.match(r"\((\d+)\) Window", line.strip())
        if not m:
            continue
        for j in range(i + 1, min(i + 8, len(lines))):
            if lines[j].startswith("Arguments:"):
                if _window_args_unpartitioned(lines[j]):
                    unpart.add(m.group(1))
                break
    if not unpart:
        return False
    for idx, line in enumerate(lines):
        m = re.search(r"Window \((\d+)\)\s*$", line)
        if not m or m.group(1) not in unpart:
            continue
        child = lines[idx + 1] if idx + 1 < len(lines) else ""
        if not _BOUNDED_CHILDREN.search(child):
            return True
    return False


def lint(names: list[str] | None = None) -> dict[str, list[str]]:
    qs, ors = queries(), oracles()
    targets = names or sorted(ors)
    spark = get_spark(shuffle_partitions=4)
    bad: dict[str, list[str]] = {}
    for name in targets:
        try:
            plan = plan_string(qs[name](spark, SF_SMALL))
        except Exception as e:  # building the frame failed outright
            bad[name] = [f"plan construction raised: {e!r:.120}"]
            continue
        hits = [
            marker
            for marker, allow in RULES
            if marker in plan and name not in allow
        ]
        if unbounded_global_windows(plan) and name not in GLOBAL_WINDOW_OK:
            hits.append("UnboundedGlobalWindow")
        if hits:
            bad[name] = hits
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    bad = lint(args.names or None)
    for name, hits in sorted(bad.items()):
        print(f"LINT {name}: {', '.join(hits)}")
    print(f"== {len(bad)} queries flagged ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
