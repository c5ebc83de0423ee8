"""Semantic invariants for wave-46 operators (word burstiness, hapax by
source, capacity percentiles) — independent python re-implementations
on top of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_word_burstiness_matches_python(spark):
    res = _Q["text_word_burstiness"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    cf: Counter = Counter()
    df_sets: dict[str, set] = defaultdict(set)
    for r in docs.itertuples():
        for t in r.text.split(" "):
            if t:
                cf[t] += 1
                df_sets[t].add(r.doc_id)
    cand = {
        t: (cf[t], len(df_sets[t]))
        for t in cf
        if cf[t] >= 20
    }
    order = sorted(
        cand.items(), key=lambda kv: (-kv[1][0] / kv[1][1], kv[0])
    )[:25]
    assert [(r.token, r.collection_freq, r.doc_freq) for r in res.itertuples()] == [
        (t, c, d) for t, (c, d) in order
    ]
    for r in res.itertuples():
        assert r.burstiness == pytest.approx(
            r.collection_freq / r.doc_freq, abs=1e-3
        )
    # burstiness is >= 1 by construction
    assert (res["burstiness"] >= 1.0).all()


def test_hapax_by_source_matches_python(spark):
    res = _Q["text_hapax_by_source"](spark, SF_DIR).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    per_src: dict[str, Counter] = defaultdict(Counter)
    for r in docs.itertuples():
        per_src[r.source].update(t for t in r.text.split(" ") if t)
    assert set(res.index) == set(per_src)
    for src, cnt in per_src.items():
        row = res.loc[src]
        hapax = sum(1 for c in cnt.values() if c == 1)
        assert row["n_tokens"] == sum(cnt.values())
        assert row["vocab"] == len(cnt)
        assert row["hapax"] == hapax
        assert row["hapax_ratio"] == pytest.approx(hapax / len(cnt), abs=1e-6)
        assert row["ttr"] == pytest.approx(
            len(cnt) / sum(cnt.values()), abs=1e-6
        )
    assert res["hapax_ratio"].between(0, 1).all()


def test_capacity_p99_matches_numpy(spark):
    res = _Q["agg_capacity_p99"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    minute = ev["ts"].astype("datetime64[us]").astype("int64") // 60000000
    load = pd.Series(minute).value_counts().sort_index()
    pairs = sorted(zip(load.values, load.index))
    n = len(pairs)
    def pick(q):
        return pairs[math.ceil(q * n) - 1][0]
    assert res["active_minutes"] == n
    assert res["p50"] == pick(0.50)
    assert res["p95"] == pick(0.95)
    assert res["p99"] == pick(0.99)
    assert res["peak"] == load.max()
    assert res["peak_over_p99"] == pytest.approx(
        load.max() / pick(0.99), abs=1e-3
    )
    # percentiles are ordered
    assert res["p50"] <= res["p95"] <= res["p99"] <= res["peak"]
