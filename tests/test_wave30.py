"""Semantic invariants for wave-30 operators (Chao1 richness,
hypergeometric enrichment, MASE scoring) — independent python/scipy-free
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from hive_processor_spark.functions.mathtab import LNFACT_Q
from tests.conftest import SF_DIR

_Q = queries()


def test_chao1_matches_python(spark):
    res = _Q["text_chao1_richness"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    freq = Counter(t for text in docs["text"] for t in text.split(" ") if t)
    fof = Counter(freq.values())
    obs, n = len(freq), sum(freq.values())
    f1, f2 = fof[1], fof[2]
    chao1 = obs + f1 * f1 / (2.0 * max(f2, 1))
    assert res["observed"] == obs
    assert res["n_tokens"] == n
    assert res["singletons"] == f1
    assert res["doubletons"] == f2
    assert res["chao1"] == pytest.approx(chao1, abs=0.01)
    assert res["good_turing_coverage"] == pytest.approx(1 - f1 / n, abs=1e-6)
    # Chao1 never estimates fewer species than observed
    assert res["chao1"] >= res["observed"]


def test_lnfact_table_is_exact(spark):
    # spot-check the shared math table against exact integer factorials
    f = 1
    for m in (0, 1, 2, 10, 100, 499, 500, 5000):
        fact = math.factorial(m)
        expect = math.floor((math.log(fact) if m > 1 else 0.0) * 1e9)
        assert LNFACT_Q[m] == expect


def test_hypergeom_matches_python(spark):
    res = (
        _Q["stats_hypergeom_enrichment"](spark, SF_DIR)
        .toPandas()
        .set_index(["lang", "source"])
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    N = len(docs)
    K = docs.groupby("lang").size()
    S = docs.groupby("source").size()
    obs = docs.groupby(["lang", "source"]).size()

    def lnC(a, b):
        return (LNFACT_Q[a] - LNFACT_Q[b] - LNFACT_Q[a - b]) / 1e9

    for (lg, src), k in obs.items():
        kk, sn = int(K[lg]), int(S[src])
        pq = 0
        for j in range(k, min(kk, sn) + 1):
            ln_t = (
                lnC(kk, j)
                + lnC(N - kk, sn - j)
                - lnC(N, sn)
            )
            pq += math.floor(math.exp(ln_t) * 1e12)
        row = res.loc[(lg, src)]
        assert row["n_obs"] == k
        assert row["expected"] == pytest.approx(sn * kk / N, abs=1e-3)
        assert row["p_upper"] == pytest.approx(
            min(pq / 1e12, 1.0), abs=2e-6
        )
        assert 0.0 <= row["p_upper"] <= 1.0
    # sanity: a random assignment yields a roughly uniform p distribution —
    # at least one cell must be unremarkable
    assert (res["p_upper"] > 0.2).any()


def test_mase_matches_pandas(spark):
    res = _Q["ts_forecast_mase"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x = (
        (orders["o_totalprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(orders["o_orderdate"].dt.date)
        .sum()
        .sort_index()
        .to_numpy()
    )
    n = len(x)
    split = math.floor(0.8 * n)
    prev = np.abs(np.diff(x))
    scale_sae = prev[: split - 1].sum()  # rn 2..split
    scale_n = split - 1
    test_idx = np.arange(split, n)  # 0-based rn>split
    test_idx = test_idx[test_idx >= 7]
    seas_ae = np.abs(x[test_idx] - x[test_idx - 7]).sum()
    naive_ae = np.abs(x[test_idx] - x[test_idx - 1]).sum()
    tn = len(test_idx)
    scale = scale_sae / scale_n
    assert res["n_test"] == tn
    assert res["naive_scale"] == pytest.approx(scale / 100.0, abs=0.01)
    assert res["seasonal_naive_mae"] == pytest.approx(
        seas_ae / tn / 100.0, abs=0.01
    )
    assert res["naive_mae"] == pytest.approx(naive_ae / tn / 100.0, abs=0.01)
    assert res["mase_seasonal"] == pytest.approx(
        (seas_ae / tn) / scale, abs=1e-4
    )
    assert res["mase_naive"] == pytest.approx(
        (naive_ae / tn) / scale, abs=1e-4
    )
    # both naive rules score near 1 on an unstructured series
    assert 0.5 < res["mase_naive"] < 2.0
