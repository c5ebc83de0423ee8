"""Semantic invariants for wave-17 operators (Hurst R/S, DP noise release,
Jarque-Bera, naive Bayes) — each checked against an independent
numpy/python re-implementation on top of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _daily_dollars() -> np.ndarray:
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cents = (
        (li["l_extendedprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(li["l_shipdate"].dt.date)
        .sum()
        .sort_index()
    )
    return (cents // 100).to_numpy()


def test_hurst_matches_numpy_rs_analysis(spark):
    res = _Q["ts_hurst"](spark, SF_DIR).toPandas().iloc[0]
    x = _daily_dollars()
    rs_avg = {}
    for m in (8, 16, 32, 64):
        q = []
        for b in range(len(x) // m):
            blk = x[b * m : (b + 1) * m].astype(object)  # exact int math
            s, ss = sum(blk), sum(v * v for v in blk)
            if m * ss - s * s <= 0:
                continue
            cs = np.cumsum(blk)
            zn = [m * cs[t] - (t + 1) * s for t in range(m)]
            rs = (max(zn) - min(zn)) / math.sqrt(m * ss - s * s)
            q.append(math.floor(rs * 1e6))
        rs_avg[m] = sum(q) / 1e6 / len(q)
        assert res[f"rs_{m}"] == pytest.approx(rs_avg[m], abs=1e-3)
    lx = [math.log(m) for m in (8, 16, 32, 64)]
    ly = [math.log(rs_avg[m]) for m in (8, 16, 32, 64)]
    n = 4
    slope = (
        n * sum(a * b for a, b in zip(lx, ly)) - sum(lx) * sum(ly)
    ) / (n * sum(a * a for a in lx) - sum(lx) ** 2)
    assert res["hurst"] == pytest.approx(slope, abs=1e-3)
    # a daily revenue aggregate of ~iid orders: H must sit in a sane band
    assert 0.0 < res["hurst"] < 1.0


def test_dp_noise_matches_laplace_inverse_cdf(spark):
    res = _Q["pipeline_dp_noise"](spark, SF_DIR).toPandas().set_index("lang")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    truth = docs.groupby("lang").size()
    for lang, n in truth.items():
        key = ord(lang[0]) * 256 + ord(lang[1])
        u = ((key * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        noise = -(1.0 if u >= 0.5 else -1.0) * math.log(1 - 2 * abs(u - 0.5))
        row = res.loc[lang]
        assert row["n_true"] == n
        assert row["noise"] == pytest.approx(noise, abs=1e-6)
        assert row["n_released"] == max(0, round(n + noise))
    # epsilon=1 Laplace noise is almost surely small relative to counts
    assert (res["n_released"] - res["n_true"]).abs().max() < 50


def test_jarque_bera_matches_numpy_moments(spark):
    res = _Q["stats_jarque_bera"](spark, SF_DIR).toPandas().set_index("status")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    for st, grp in orders.groupby("o_orderstatus"):
        x = grp["o_totalprice"].to_numpy()
        n = len(x)
        mean = np.floor(x * 100).sum() / 100.0 / n
        d = x - mean
        s2, s3, s4 = (d**2).sum(), (d**3).sum(), (d**4).sum()
        skew = (s3 / n) / (s2 / n) ** 1.5
        kurt = (s4 / n) / (s2 / n) ** 2
        jb = n / 6.0 * (skew**2 + (kurt - 3) ** 2 / 4.0)
        row = res.loc[st]
        assert row["n"] == n
        assert row["skewness"] == pytest.approx(skew, abs=1e-3)
        assert row["kurtosis"] == pytest.approx(kurt, abs=1e-3)
        assert row["jarque_bera"] == pytest.approx(jb, rel=1e-2)


def test_naive_bayes_matches_python_nb(spark):
    res = _Q["ml_naive_bayes"](spark, SF_DIR).toPandas().set_index("lang")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    train = docs[docs["doc_id"] % 2 == 0]
    test = docs[docs["doc_id"] % 2 == 1]
    counts: dict[str, Counter] = {}
    for r in train.itertuples():
        counts.setdefault(r.lang, Counter()).update(r.text.split(" "))
    vocab = len({t for c in counts.values() for t in c})
    tot = {c: sum(cnt.values()) for c, cnt in counts.items()}
    prior_q = {
        c: math.floor(
            math.log(len(train[train["lang"] == c]) / len(train)) * 1e6
        )
        for c in counts
    }
    correct: Counter = Counter()
    n_test: Counter = Counter()
    for r in test.itertuples():
        scores = {}
        for c in counts:
            s = prior_q[c]
            for t in r.text.split(" "):
                p = (counts[c][t] + 1) / (tot[c] + vocab)
                s += math.floor(math.log(p) * 1e6)
            scores[c] = s
        pred = max(sorted(scores), key=lambda c: (scores[c], [-ord(ch) for ch in c]))
        n_test[r.lang] += 1
        if pred == r.lang:
            correct[r.lang] += 1
    for lang in n_test:
        row = res.loc[lang]
        assert row["n_test"] == n_test[lang]
        assert row["n_correct"] == correct[lang]
        assert row["accuracy"] == pytest.approx(
            correct[lang] / n_test[lang], abs=1e-6
        )
    # the synthetic corpus shares one vocabulary across languages: NB must
    # still beat the 20% uniform-guess baseline overall or the fit is broken
    assert sum(correct.values()) / sum(n_test.values()) > 0.2
