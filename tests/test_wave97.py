"""Semantic invariants for wave-97 operators (Welch periodogram, Theil
decomposition, power-iteration eigenvalue) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_welch_periodogram_matches_python(spark):
    res = (
        _Q["ts_welch_periodogram"](spark, SF_DIR)
        .toPandas()
        .set_index("period_days")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    cnt = ev.groupby(ev["ts"].dt.date).size().sort_index().to_numpy()
    for p in (7, 14):
        powers = []
        k = 0
        while k * 7 + 14 <= len(cnt):
            seg = cnt[k * 7 : k * 7 + 14].astype(float)
            mu = seg.mean()
            u = np.arange(14)
            c = ((seg - mu) * np.cos(2 * math.pi * u / p)).sum()
            s = ((seg - mu) * np.sin(2 * math.pi * u / p)).sum()
            powers.append((c * c + s * s) / 14)
            k += 1
        row = res.loc[p]
        assert row["n_segments"] == len(powers)
        assert row["welch_power"] == pytest.approx(
            float(np.mean(powers)), rel=1e-3
        )
    # weekly cadence dominates the off-harmonic 14-day line or at least
    # both are nonnegative
    assert (res["welch_power"] >= 0).all()


def test_theil_decomposition_matches_python_and_closes(spark):
    res = _Q["agg_theil_decomposition"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    n = pd.read_parquet(
        f"{SF_DIR}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    y = (m["o_totalprice"] * 100.0).map(math.floor).astype(float)
    grp = m["n_name"]
    N, S = len(y), y.sum()
    t_total = (y * np.log(y)).sum() / S - math.log(S / N)
    t_within = t_between = 0.0
    for g, yy in y.groupby(grp):
        sg, ng = yy.sum(), len(yy)
        tg = (yy * np.log(yy)).sum() / sg - math.log(sg / ng)
        t_within += (sg / S) * tg
        t_between += (sg / S) * math.log((sg / S) / (ng / N))
    assert res["n_orders"] == N
    assert res["theil_total"] == pytest.approx(t_total, abs=1e-4)
    assert res["theil_within"] == pytest.approx(t_within, abs=1e-4)
    assert res["theil_between"] == pytest.approx(t_between, abs=1e-4)
    # additive decomposability closes
    assert abs(res["closure_residual"]) < 1e-6


def test_power_iteration_matches_numpy_eig(spark):
    res = _Q["embed_power_iteration"](spark, SF_DIR).toPandas().iloc[0]
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.array(list(emb["embedding"]), dtype=np.float64)
    cov = np.cov(mat, rowvar=False, bias=True)
    eig = np.linalg.eigvalsh(cov)
    lam_true = float(eig[-1])
    assert res["dim"] == 64 and res["iterations"] == 3
    # 3 power iterations from a uniform start: Rayleigh quotient is a
    # lower bound converging to lambda_1
    assert res["lambda1"] <= lam_true + 1e-3
    assert res["lambda1"] >= 0.5 * lam_true
    assert res["trace"] == pytest.approx(float(np.trace(cov)), abs=1e-2)
    assert res["dominance"] == pytest.approx(
        res["lambda1"] / res["trace"], abs=1e-4
    )
