"""Semantic invariants for wave-13 operators (interpolated bigram
perplexity, zone-map pruning audit)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bigram_perplexity_matches_python_lm(spark):
    res = (
        _Q["text_bigram_perplexity"](spark, SF_DIR)
        .toPandas()
        .set_index("doc_id")
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    uni: Counter = Counter()
    bc: Counter = Counter()
    doc_bigrams = {}
    for r in docs.itertuples():
        toks = r.text.strip().split(" ")
        uni.update(toks)
        bgs = list(zip(toks, toks[1:]))
        bc.update(bgs)
        doc_bigrams[r.doc_id] = bgs
    total = sum(uni.values())
    starts = Counter()
    for (w1, _w2), c in bc.items():
        starts[w1] += c
    for doc_id, bgs in doc_bigrams.items():
        mb = 0
        for w1, w2 in bgs:
            p = 0.75 * bc[(w1, w2)] / starts[w1] + 0.25 * uni[w2] / total
            mb += int(np.floor(-np.log2(p) * 1e6))
        assert res.loc[doc_id, "n_bigrams"] == len(bgs)
        assert res.loc[doc_id, "avg_bits"] == pytest.approx(
            mb / len(bgs) / 1e6, abs=1e-5
        )
    # smoothing floor: no score can exceed -log2 of the unigram floor
    worst = max(res["avg_bits"])
    floor_bits = -np.log2(0.25 * 1 / total)
    assert worst <= floor_bits


def test_manifest_prune_clustering_beats_partitioning(spark):
    res = _Q["scan_manifest_prune"](spark, SF_DIR).toPandas().set_index("layout")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    hit = li["l_extendedprice"].between(30000, 33000)
    # invariants: every layout sees the same qualifying rows
    assert (res["rows_hit"] == hit.sum()).all()
    tp = res.loc["time-partitioned"]
    vc = res.loc["value-clustered"]
    # time partitions span the price domain -> zone maps prune nothing
    assert tp["files_scanned"] == tp["files_total"]
    # value clustering makes the predicate touch only its bucket(s)
    assert vc["files_scanned"] < vc["files_total"]
    assert vc["rows_scanned"] < tp["rows_scanned"]
    assert vc["scan_efficiency"] > tp["scan_efficiency"] * 10
    # zone-map decisions are sound: scanned ⊇ fruitful
    assert (res["files_scanned"] >= res["files_fruitful"]).all()
