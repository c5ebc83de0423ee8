"""Semantic invariants for wave-44 operators (ranking stability,
zero-inflation, Fleiss kappa) — independent python/numpy
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


def test_ranking_stability_matches_python(spark):
    res = _Q["ml_ranking_stability"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    asof = ev["ts"].dt.date.max()
    age = (asof - ev["ts"].dt.date).apply(lambda td: td.days)
    cents = np.floor(ev["value"] * 100).astype("int64")
    wq = np.floor(cents * np.power(2.0, -age / 7.0) * 1e4).astype("int64")
    g = pd.DataFrame({"u": ev["user_id"], "wq": wq, "c": cents}).groupby("u")
    agg = g.agg(dq=("wq", "sum"), rq=("c", "sum"))
    decay_order = sorted(agg.index, key=lambda u: (-agg.loc[u, "dq"], u))
    raw_order = sorted(agg.index, key=lambda u: (-agg.loc[u, "rq"], u))
    top_d, top_r = set(decay_order[:20]), set(raw_order[:20])
    overlap = len(top_d & top_r)
    rd = {u: i + 1 for i, u in enumerate(decay_order)}
    rr = {u: i + 1 for i, u in enumerate(raw_order)}
    shift = (
        sum(abs(rd[u] - rr[u]) for u in top_d & top_r) / overlap
        if overlap
        else None
    )
    assert res["overlap_20"] == overlap
    assert res["jaccard_20"] == pytest.approx(
        overlap / (40 - overlap), abs=1e-6
    )
    assert res["churned_members"] == len(top_d ^ top_r)
    assert res["mean_rank_shift"] == pytest.approx(shift, abs=1e-3)
    # the two scorers are correlated but not identical
    assert 0 < overlap <= 20


def test_zero_inflation_matches_numpy(spark):
    res = _Q["stats_zero_inflation"](spark, SF_DIR).toPandas().iloc[0]
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    o01 = orders[orders["o_orderdate"] >= "2001-01-01"]
    counts = (
        cust[["c_custkey"]]
        .merge(
            o01.groupby("o_custkey").size().rename("k"),
            left_on="c_custkey",
            right_index=True,
            how="left",
        )["k"]
        .fillna(0)
        .astype(int)
    )
    n = len(counts)
    lam = counts.sum() / n
    n0 = (counts == 0).sum()
    expected = n * math.exp(-lam)
    score = (n0 - expected) ** 2 / (
        expected * (1 - math.exp(-lam))
        - counts.sum() * math.exp(-2 * lam)
    )
    assert res["n"] == n
    assert res["n0"] == n0
    assert res["lambda_hat"] == pytest.approx(lam, abs=1e-5)
    assert res["expected_zeros"] == pytest.approx(expected, abs=0.01)
    assert res["zero_ratio"] == pytest.approx(n0 / expected, abs=1e-3)
    assert res["score_stat"] == pytest.approx(score, rel=1e-3)
    # left join preserved every customer, including the all-zero ones
    assert res["n"] == len(cust)


def test_fleiss_kappa_matches_python(spark):
    res = _Q["stats_fleiss_kappa"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    langs = ["de", "en", "es", "fr", "zh"]
    items = []
    for r in docs.itertuples():
        counts: Counter = Counter()
        for k in range(3):
            h = (r.doc_id * 1000003 + k * 2654435761) % 4294967296
            if h % 10 < 2:
                idx = langs.index(r.lang)
                lab = langs[(idx + 1 + h % 4) % 5]
            else:
                lab = r.lang
            counts[lab] += 1
        items.append(counts)
    N = len(items)
    s_num = sum(sum(c * c for c in it.values()) - 3 for it in items)
    cat: Counter = Counter()
    for it in items:
        cat.update(it)
    s_cj2 = sum(c * c for c in cat.values())
    p_bar = s_num / (6 * N)
    p_e = s_cj2 / (9 * N * N)
    kappa = (p_bar - p_e) / (1 - p_e)
    assert res["n_items"] == N
    assert res["p_bar"] == pytest.approx(p_bar, abs=1e-6)
    assert res["p_e"] == pytest.approx(p_e, abs=1e-6)
    assert res["fleiss_kappa"] == pytest.approx(kappa, abs=1e-5)
    # ~20% independent noise per rater: strong but imperfect agreement
    assert 0.4 < res["fleiss_kappa"] < 0.95
