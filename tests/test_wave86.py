"""Semantic invariants for wave-86 operators (TwoNN intrinsic
dimension, hubness, anisotropy) — independent numpy re-derivations
from the raw embeddings fixture."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _mat():
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb.sort_values("vec_id")
    return (
        emb["vec_id"].to_numpy(np.int64),
        np.array(list(emb["embedding"]), dtype=np.float64),
    )


def _quantized_sims(mat):
    # mirror the engine's quantized cosine exactly
    qn = np.floor(mat * mat * 1e12).astype(np.int64).sum(axis=1) / 1e12
    dots = (
        np.floor(mat[:, None, :] * mat[None, :, :] * 1e12)
        .astype(np.int64)
        .sum(axis=2)
        / 1e12
    )
    return dots / np.sqrt(qn[:, None] * qn[None, :])


def test_intrinsic_dim_matches_numpy(spark):
    res = _Q["embed_intrinsic_dim"](spark, SF_DIR).toPandas().iloc[0]
    ids, mat = _mat()
    sims = _quantized_sims(mat)
    np.fill_diagonal(sims, -np.inf)
    n = len(ids)
    lnsum = 0.0
    used = 0
    for i in range(n):
        s = sims[i]
        valid = s < 1 - 1e-9
        vv = np.sort(s[valid])[::-1]
        if len(vv) < 2:
            continue
        s1, s2 = vv[0], vv[1]
        used += 1
        lnsum += math.log((1 - s2) / (1 - s1))
    assert res["n_vecs"] == n
    assert res["n_used"] == used
    assert res["sum_ln_mu"] == pytest.approx(lnsum, abs=1e-5)
    assert res["id_mle"] == pytest.approx(used / lnsum, abs=1e-2)
    # a 64-dim synthetic fixture must report a plausible positive ID
    assert 0.5 < res["id_mle"] < 128


def test_hubness_matches_numpy(spark):
    res = _Q["embed_hubness"](spark, SF_DIR).toPandas().iloc[0]
    ids, mat = _mat()
    sims = _quantized_sims(mat)
    n = len(ids)
    k = 10
    nk = np.zeros(n, dtype=np.int64)
    for i in range(n):
        order = sorted(
            (j for j in range(n) if j != i),
            key=lambda j: (-sims[i, j], ids[j]),
        )[:k]
        for j in order:
            nk[j] += 1
    x = nk.astype(float)
    m1 = x.mean()
    var = (x**2).mean() - m1**2
    skew = ((x**3).mean() - 3 * m1 * (x**2).mean() + 2 * m1**3) / var**1.5
    assert res["n_vecs"] == n and res["k"] == k
    # conservation: every point emits exactly k edges
    assert res["mean_nk"] == pytest.approx(k, abs=1e-9)
    assert res["var_nk"] == pytest.approx(var, abs=1e-4)
    assert res["skewness_sk"] == pytest.approx(skew, abs=1e-3)
    assert res["max_nk"] == int(nk.max())
    assert res["n_orphans"] == int((nk == 0).sum())


def test_anisotropy_matches_numpy(spark):
    res = _Q["embed_anisotropy"](spark, SF_DIR).toPandas().iloc[0]
    ids, mat = _mat()
    qn = np.floor(mat * mat * 1e12).astype(np.int64).sum(axis=1) / 1e12
    u = mat / np.sqrt(qn)[:, None]
    n, d = mat.shape
    s = u.sum(axis=0)
    aniso = ((s @ s) - n) / (n * (n - 1))
    assert res["n_vecs"] == n and res["dim"] == d
    assert res["anisotropy"] == pytest.approx(aniso, abs=1e-4)
    dom = int(np.argmax(np.abs(s)))
    assert res["dominant_dim"] == dom + 1
    assert res["dominant_mean_component"] == pytest.approx(
        s[dom] / n, abs=1e-4
    )
    # identity check: mean pairwise cosine of unit vectors is in [-1, 1]
    assert -1.0 <= res["anisotropy"] <= 1.0
