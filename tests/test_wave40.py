"""Semantic invariants for wave-40 operators (McNemar, linear Shapley
attribution, degree assortativity) — independent python/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_mcnemar_matches_python(spark):
    res = _Q["stats_mcnemar"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    y = (ev["event_type"] == "purchase").to_numpy()
    pa = (ev["value"] >= 100.0).to_numpy()
    pb = (ev["value"] >= 120.0).to_numpy()
    b = ((pa == y) & (pb != y)).sum()
    c = ((pa != y) & (pb == y)).sum()
    chi2 = (abs(int(b) - int(c)) - 1) ** 2 / (b + c)
    assert res["a_only_right"] == b
    assert res["b_only_right"] == c
    assert res["both_right"] == ((pa == y) & (pb == y)).sum()
    assert res["both_wrong"] == ((pa != y) & (pb != y)).sum()
    assert res["mcnemar_chi2"] == pytest.approx(chi2, abs=1e-3)
    assert res["differs_5pct"] == int(chi2 > 3.841)
    # cells partition the data
    total = (
        res["a_only_right"]
        + res["b_only_right"]
        + res["both_right"]
        + res["both_wrong"]
    )
    assert total == len(ev)


def test_linear_attribution_identity_and_values(spark):
    res = _Q["ml_linear_attribution"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    x1 = docs["text"].str.split(" ").str.len().to_numpy().astype(float)
    x2 = (docs["doc_id"] % 7).to_numpy().astype(float)
    y = docs["n_chars"].to_numpy().astype(float)
    n = len(y)
    X = np.column_stack([np.ones(n), x1, x2])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    m1, m2, my = x1.mean(), x2.mean(), y.mean()
    by_doc = {d: i for i, d in enumerate(docs["doc_id"])}
    for r in res.itertuples():
        i = by_doc[r.doc_id]
        cw = beta[1] * (x1[i] - m1)
        cn = beta[2] * (x2[i] - m2)
        assert r.baseline == pytest.approx(my, abs=1e-2)
        assert r.contrib_words == pytest.approx(cw, abs=1e-2)
        assert r.contrib_noise == pytest.approx(cn, abs=1e-2)
        assert r.prediction == pytest.approx(my + cw + cn, abs=1e-2)
        # the Shapley identity: contributions sum to pred - baseline
        assert r.prediction - r.baseline == pytest.approx(
            r.contrib_words + r.contrib_noise, abs=2e-4
        )
    # the words feature dominates attribution magnitude
    assert res["contrib_words"].abs().mean() > 10 * res[
        "contrib_noise"
    ].abs().mean()


def test_assortativity_matches_numpy(spark):
    res = _Q["graph_assortativity"](spark, SF_DIR).toPandas().iloc[0]
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb[emb["vec_id"] < 200].sort_values("vec_id")
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.floor(v * v * 1e12).sum(axis=1) / 1e12
    ids = emb["vec_id"].to_numpy()
    edges = set()
    for i in range(len(ids)):
        sims = np.floor(v[i] * v * 1e12).sum(axis=1) / 1e12
        sims = sims / np.sqrt(norms[i] * norms)
        for j in sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[j], ids[j]),
        )[:3]:
            edges.add((ids[i], ids[j]))
            edges.add((ids[j], ids[i]))
    deg = Counter(a for a, _ in edges)
    di = np.array([deg[a] for a, _ in sorted(edges)], dtype=float)
    dj = np.array([deg[b] for _, b in sorted(edges)], dtype=float)
    r = np.corrcoef(di, dj)[0, 1]
    assert res["n_directed_edges"] == len(edges)
    assert res["mean_degree_at_edge"] == pytest.approx(di.mean(), abs=1e-3)
    assert res["assortativity"] == pytest.approx(r, abs=1e-4)
    # kNN similarity graphs are typically disassortative
    assert -1.0 <= res["assortativity"] <= 1.0
