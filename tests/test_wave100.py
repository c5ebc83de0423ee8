"""Semantic invariants for wave-100 operators (hash quality,
Wasserstein drift, near-dup threshold curve) — independent python
re-derivations from raw fixture data."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_hash_quality_matches_python(spark):
    res = _Q["profile_hash_quality"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet", columns=["o_orderkey"])
    h = o["o_orderkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
    )
    n = len(h)
    counts = (h % 64).value_counts()
    exp = n / 64
    chi2 = (((counts - exp) ** 2) / exp).sum()
    hv = h.to_numpy().astype(np.int64)
    bit_dev = max(
        abs(((hv >> i) & 1).sum() / n - 0.5) for i in range(20)
    )
    assert res["n_keys"] == n
    assert res["occupied_buckets"] == len(counts)
    assert res["chi2_uniformity"] == pytest.approx(chi2, abs=1e-2)
    assert res["chi2_z"] == pytest.approx(
        (chi2 - 63) / math.sqrt(2 * 63), abs=1e-3
    )
    assert res["max_bit_bias"] == pytest.approx(bit_dev, abs=1e-6)
    # md5 should actually look uniform: z within +-4, bias < 2%
    assert abs(res["chi2_z"]) < 4.0
    assert res["max_bit_bias"] < 0.02


def test_wasserstein_matches_python(spark):
    res = _Q["profile_drift_wasserstein"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o = o[(o["o_orderdate"] >= "1997-01-01") & (o["o_orderdate"] < "1999-01-01")]
    x = (o["o_totalprice"] * 100.0).map(math.floor).astype("int64")
    snap = (o["o_orderdate"] >= "1998-01-01").astype(int)
    a = np.sort(x[snap == 0].to_numpy())
    b = np.sort(x[snap == 1].to_numpy())
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    gaps = np.abs(fa - fb)
    w1 = float((gaps[:-1] * np.diff(grid)).sum())
    ks = float(gaps.max())
    assert res["n_1997"] == len(a) and res["n_1998"] == len(b)
    assert res["wasserstein_dollars"] == pytest.approx(w1 / 100.0, abs=1e-2)
    assert res["ks_distance"] == pytest.approx(ks, abs=1e-6)
    # W1 in dollars is bounded by KS * range
    rng = (grid[-1] - grid[0]) / 100.0
    assert res["wasserstein_dollars"] <= res["ks_distance"] * rng + 1e-9


def test_neardup_curve_matches_numpy(spark):
    res = _Q["embed_neardup_threshold_curve"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy(np.int64)
    mat = np.array(list(emb["embedding"]), dtype=np.float64)
    qn = np.floor(mat * mat * 1e12).astype(np.int64).sum(axis=1) / 1e12
    dots = (
        np.floor(mat[:, None, :] * mat[None, :, :] * 1e12)
        .astype(np.int64)
        .sum(axis=2)
        / 1e12
    )
    sims = dots / np.sqrt(qn[:, None] * qn[None, :])
    iu = np.triu_indices(len(ids), k=1)
    s = sims[iu]
    n = len(ids)
    for _, row in res.iterrows():
        t = row["threshold"]
        mask = s >= t
        assert row["n_pairs"] == int(mask.sum())
        involved = set(iu[0][mask]) | set(iu[1][mask])
        assert row["n_vecs_involved"] == len(involved)
        assert row["corpus_fraction"] == pytest.approx(
            len(involved) / n, abs=1e-6
        )
    # monotone: higher threshold never fires more pairs
    assert res.sort_values("threshold")["n_pairs"].is_monotonic_decreasing
