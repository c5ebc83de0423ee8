"""Semantic invariants for wave-108 (Poisson mixture EM) — the unrolled
engine iterations must match a sequential python EM with the same
quantization, and the fit must behave like an EM fit."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _em_python(counts):
    x, f = np.unique(counts, return_counts=True)
    x = x.astype(float)
    f = f.astype(float)
    n = f.sum()
    cum = np.cumsum(f)
    q1 = x[np.searchsorted(cum, math.ceil(0.25 * n))]
    q3 = x[np.searchsorted(cum, math.ceil(0.75 * n))]
    pi, l1, l2 = 0.5, float(q1), float(q3)
    for _ in range(3):
        logit = math.log(pi / (1 - pi)) + x * math.log(l1 / l2) - (l1 - l2)
        gam = 1.0 / (1.0 + np.exp(-logit))
        fg = np.floor(f * gam * 1e9).sum() / 1e9
        fgx = np.floor(f * gam * x * 1e6).sum() / 1e6
        fhx = np.floor(f * (1 - gam) * x * 1e6).sum() / 1e6
        pi = fg / n
        l1 = fgx / fg
        l2 = fhx / (n - fg)
    return pi, l1, l2


def test_poisson_em_matches_sequential_python(spark):
    res = _Q["ml_poisson_mixture_em"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    counts = ev.groupby(ev["ts"].dt.normalize()).size().to_numpy()
    pi, l1, l2 = _em_python(counts)
    assert res["em_iterations"] == 3
    assert res["pi_low"] == pytest.approx(pi, abs=1e-4)
    assert res["lambda_low"] == pytest.approx(l1, abs=1e-2)
    assert res["lambda_high"] == pytest.approx(l2, abs=1e-2)
    assert res["separation_ratio"] == pytest.approx(l2 / l1, abs=1e-3)


def test_poisson_em_is_a_sane_mixture(spark):
    res = _Q["ml_poisson_mixture_em"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts"])
    counts = ev.groupby(ev["ts"].dt.normalize()).size().to_numpy(float)
    # components bracket the global mean and keep their ordering
    assert res["lambda_low"] <= counts.mean() <= res["lambda_high"]
    assert res["separation_ratio"] >= 1.0
    assert 0.0 < res["pi_low"] < 1.0
    # mixture mean reproduces the sample mean reasonably
    mix_mean = (
        res["pi_low"] * res["lambda_low"]
        + (1 - res["pi_low"]) * res["lambda_high"]
    )
    assert mix_mean == pytest.approx(counts.mean(), rel=0.05)
