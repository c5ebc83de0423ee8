"""Semantic invariants for wave-99 operators (class-balanced weights,
Spiegelhalter Z, Dixon Q) — independent python re-derivations from
raw fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_class_balance_weights_match_python(spark):
    res = _Q["ml_class_balance_weights"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["label"])
    counts = emb["label"].value_counts().sort_index()
    beta = 0.999
    raw = (1 - beta) / (1 - beta ** counts)
    k = len(counts)
    bal = raw * k / raw.sum()
    inv = (counts.sum() / k) / counts
    got = res.set_index("label")
    for lbl in counts.index:
        assert got.loc[lbl, "n_samples"] == counts[lbl]
        assert got.loc[lbl, "raw_weight"] == pytest.approx(raw[lbl], abs=1e-9)
        assert got.loc[lbl, "balanced_weight"] == pytest.approx(
            bal[lbl], abs=1e-5
        )
        assert got.loc[lbl, "inverse_freq_weight"] == pytest.approx(
            inv[lbl], abs=1e-5
        )
    # normalized weights average to 1
    assert got["balanced_weight"].mean() == pytest.approx(1.0, abs=1e-4)
    # effective-number weights are tamer than inverse frequency on the
    # rarest class
    rare = counts.idxmin()
    common = counts.idxmax()
    assert (
        got.loc[rare, "balanced_weight"] / got.loc[common, "balanced_weight"]
        <= got.loc[rare, "inverse_freq_weight"]
        / got.loc[common, "inverse_freq_weight"]
        + 1e-9
    )


def test_spiegelhalter_matches_python(spark):
    res = _Q["ml_calibration_spiegelhalter"](spark, SF_DIR).toPandas().iloc[0]
    ev = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["event_type", "value"]
    )
    p = np.minimum(ev["value"] / 500.0, 1.0).to_numpy()
    y = (ev["event_type"] == "purchase").astype(int).to_numpy()
    num = ((y - p) * (1 - 2 * p)).sum()
    var = ((1 - 2 * p) ** 2 * p * (1 - p)).sum()
    assert res["n"] == len(y)
    assert res["z_numerator"] == pytest.approx(num, abs=1e-2)
    assert res["z_variance"] == pytest.approx(var, abs=1e-2)
    assert res["spiegelhalter_z"] == pytest.approx(
        num / math.sqrt(var), abs=1e-3
    )


def test_dixon_q_matches_python(spark):
    res = _Q["stats_dixon_q"](spark, SF_DIR).toPandas().iloc[0]
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
    rev = (
        (m["o_totalprice"] * 100.0)
        .map(math.floor)
        .groupby(m["n_name"])
        .sum()
        .sort_values(kind="stable")
    )
    vals = rev.to_numpy()
    q_low = (vals[1] - vals[0]) / (vals[-1] - vals[0])
    q_high = (vals[-1] - vals[-2]) / (vals[-1] - vals[0])
    assert res["n_groups"] == len(vals)
    assert res["low_name"] == rev.index[0]
    assert res["high_name"] == rev.index[-1]
    assert res["q_low"] == pytest.approx(q_low, abs=1e-6)
    assert res["q_high"] == pytest.approx(q_high, abs=1e-6)
    assert res["low_is_outlier"] == int(q_low > 0.406)
    assert res["high_is_outlier"] == int(q_high > 0.406)
