"""Property tests for the round-8 wave operators (177-179) — invariants
the fixed-fixture differential cannot express: brute-force agreement,
bound guarantees, monotonicity, and cross-operator consistency."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from hive_processor_spark import queries
from tests.conftest import SF_DIR, SF_SMALL

_Q = queries()


def test_gopher_rules_keep_is_conjunction(spark):
    out = _Q["text_gopher_rules"](spark, SF_DIR).toPandas()
    flags = ["r_wordcount", "r_meanlen", "r_stopwords", "r_repetition", "r_distinct"]
    conj = out[flags].prod(axis=1)
    assert (out["keep"] == conj).all()
    # the wordcount flag is exactly re-derivable from the emitted count
    expect_wc = ((out["n_tokens"] >= 30) & (out["n_tokens"] <= 10000)).astype(int)
    assert (out["r_wordcount"] == expect_wc).all()
    # the battery must actually discriminate on this corpus
    assert 0 < out["keep"].sum() < len(out)


def test_substring_spans_match_bruteforce(spark):
    """Top-20 repeated 20-token spans equal an independent pure-Python
    recount over the same parquet (occurrence and doc counts included)."""
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    occ: Counter = Counter()
    doc_sets: dict = {}
    for _, r in docs.iterrows():
        w = str(r["text"]).strip().split(" ")
        for i in range(len(w) - 19):
            span = " ".join(w[i : i + 20])
            occ[span] += 1
            doc_sets.setdefault(span, set()).add(r["doc_id"])
    truth = {
        s: (n, len(doc_sets[s])) for s, n in occ.items() if n >= 2
    }
    out = _Q["dedup_substring_spans"](spark, SF_SMALL).toPandas()
    assert len(out) == min(20, len(truth))
    for _, r in out.iterrows():
        assert truth[r["span"]] == (r["n_occ"], r["n_docs"])
    # emitted rows are a true top slice by occurrence count
    if len(truth) > len(out):
        emitted = set(out["span"])
        floor_n = out["n_occ"].min()
        for s, (n, _) in truth.items():
            if s not in emitted:
                assert n <= floor_n


def test_hdr_sketch_brackets_exact_quantile(spark):
    """The reported bucket must CONTAIN the true order statistic, and the
    realized relative error can never exceed the bucket's design width
    (1/16 of the octave base over the bucket's lower bound)."""
    out = _Q["sketch_hdr_quantile"](spark, SF_DIR).toPandas()
    assert len(out) == 3
    for _, r in out.iterrows():
        assert r["est_lo_cents"] <= r["exact_cents"] < r["est_hi_cents"]
        width = r["est_hi_cents"] - r["est_lo_cents"]
        # mid-point estimate error is at most half the bucket width
        assert r["rel_err"] <= (width / 2.0) / r["exact_cents"] + 1e-9
        assert r["rel_err"] <= 0.0625 / 2 + 1e-9


def test_threshold_sweep_is_monotone(spark):
    out = (
        _Q["dedup_threshold_sweep"](spark, SF_DIR)
        .toPandas()
        .sort_values("threshold")
    )
    assert (out["n_pairs"].diff().dropna() <= 0).all()
    assert (out["n_docs_touched"].diff().dropna() <= 0).all()
    assert (out["max_degree"].diff().dropna() <= 0).all()
    # the permissive end must fire on this corpus
    assert out.iloc[0]["n_pairs"] > 0


def test_keep_best_keeps_the_longest_member(spark):
    """Cross-operator consistency: within each dedup_cluster_docs cluster
    of >= 2 members, the doc dedup_keep_best keeps is the member with the
    most tokens (doc_id tiebreak), and the token accounting adds up."""
    labels = _Q["dedup_cluster_docs"](spark, SF_DIR).toPandas()
    kept = _Q["dedup_keep_best"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    nt = {
        r["doc_id"]: len(str(r["text"]).strip().split(" "))
        for _, r in docs.iterrows()
    }
    by_cluster: dict = {}
    for _, r in labels.iterrows():
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    multi = {c: m for c, m in by_cluster.items() if len(m) >= 2}
    assert set(kept["cluster_id"]) == set(multi)
    for _, r in kept.iterrows():
        members = multi[r["cluster_id"]]
        best = min(members, key=lambda d: (-nt[d], d))
        assert r["kept_doc"] == best
        assert r["n_members"] == len(members)
        assert r["kept_tokens"] == nt[best]
        assert r["dropped_tokens"] == sum(nt[d] for d in members) - nt[best]


def test_perplexity_buckets_partition_the_scored_corpus(spark):
    out = _Q["pipeline_perplexity_buckets"](spark, SF_DIR).toPandas()
    assert list(out["bucket"]) == ["head", "middle", "tail"]
    scored = _Q["text_bigram_perplexity"](spark, SF_DIR).toPandas()
    assert out["n_docs"].sum() == len(scored)
    assert out["n_bigrams"].sum() == scored["n_bigrams"].sum()
    # terciles are ordered by construction: head is the low-bits third
    assert (
        out.iloc[0]["mean_bits"] <= out.iloc[1]["mean_bits"] <= out.iloc[2]["mean_bits"]
    )
    # tercile sizes differ by at most the tie mass at the cutoffs — on a
    # corpus of n docs each bucket holds at least one doc
    assert (out["n_docs"] > 0).all()


def test_prefix_clusters_match_bruteforce(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    pre: dict = {}
    for _, r in docs.iterrows():
        w = str(r["text"]).strip().split(" ")
        p = " ".join(w[:3])
        pre.setdefault(p, []).append((r["doc_id"], len(w)))
    truth = {p: m for p, m in pre.items() if len(m) >= 2}
    out = _Q["dedup_prefix_cluster"](spark, SF_DIR).toPandas()
    assert set(out["prefix"]) == set(truth)
    for _, r in out.iterrows():
        m = truth[r["prefix"]]
        assert r["n_docs"] == len(m)
        assert r["rep_doc"] == min(d for d, _ in m)
        assert r["total_tokens"] == sum(n for _, n in m)
