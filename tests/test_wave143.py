"""Semantic invariants for wave-143 (G-test / Williams / Freeman-Tukey)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_g_test_matches_python(spark):
    res = _Q["stats_g_test"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["event_type", "ts"])
    # DuckDB DAYOFWEEK = ISODOW-compatible numbering used by the oracle is
    # mirrored by Spark dayofweek + 1; reproduce via Spark's convention:
    # Spark dayofweek: Sunday=1..Saturday=7 -> +1 gives 2..8
    dow = pd.to_datetime(ev.ts).dt.dayofweek  # Mon=0..Sun=6
    spark_dow = ((dow + 1) % 7) + 1 + 1  # Spark dayofweek (+1 shift applied)
    tab = pd.crosstab(ev.event_type, spark_dow)
    o = tab.values.astype(float)
    n = o.sum()
    rown = o.sum(axis=1, keepdims=True)
    coln = o.sum(axis=0, keepdims=True)
    e = rown @ coln / n
    mask = o > 0
    g = float(2.0 * (o[mask] * np.log(o[mask] / e[mask])).sum())
    ft = float((4.0 * (np.sqrt(o[mask]) - np.sqrt(e[mask])) ** 2).sum())
    r, c = o.shape
    q = 1.0 + (n * (1.0 / rown).sum() - 1.0) * (
        n * (1.0 / coln).sum() - 1.0
    ) / (6.0 * n * (r - 1) * (c - 1))
    assert res["n_rows"] == r and res["n_cols"] == c
    assert res["df"] == (r - 1) * (c - 1)
    assert res["g_stat"] == pytest.approx(g, rel=1e-5, abs=1e-3)
    assert res["g_williams"] == pytest.approx(g / q, rel=1e-5, abs=1e-3)
    assert res["freeman_tukey"] == pytest.approx(ft, rel=1e-5, abs=1e-3)
    # Williams correction always shrinks G
    assert res["g_williams"] <= res["g_stat"]
