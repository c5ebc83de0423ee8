"""Semantic invariants for wave-66 operators (ridge path, k-center
coreset, balanced downsampling) — independent numpy re-derivations."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_ridge_path_matches_numpy(spark):
    res = _Q["ml_ridge_path"](spark, SF_DIR).toPandas().set_index("lambda")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    X = li[["l_quantity", "l_discount"]].to_numpy(float)
    y = li["l_extendedprice"].to_numpy(float)
    n = len(y)
    Xc, yc = X - X.mean(axis=0), y - y.mean()
    G = Xc.T @ Xc
    v = Xc.T @ yc
    for lam in (0.0, 1000.0, 100000.0):
        beta = np.linalg.solve(G + lam * np.eye(2), v)
        icept = y.mean() - X.mean(axis=0) @ beta
        sse = float(yc @ yc - 2 * beta @ v + beta @ G @ beta)
        row = res.loc[lam]
        assert row["beta_qty"] == pytest.approx(beta[0], abs=1e-3)
        assert row["beta_disc"] == pytest.approx(beta[1], rel=1e-3)
        assert row["intercept"] == pytest.approx(icept, rel=1e-3)
        assert row["train_mse"] == pytest.approx(sse / n, rel=1e-3)
    # shrinkage: coefficient magnitudes decrease, train MSE increases
    assert abs(res.loc[100000.0, "beta_disc"]) <= abs(res.loc[0.0, "beta_disc"])
    assert res["train_mse"].is_monotonic_increasing


def test_kcenter_matches_numpy(spark):
    res = _Q["embed_kcenter_coreset"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    ids = emb["vec_id"].to_numpy()
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)

    def dist(a, b):
        return np.sqrt(
            np.floor((a - b) ** 2 * 1e12).astype("int64").sum(axis=-1) / 1e12
        )

    centers = [0]
    dmin = dist(M, M[ids == 0][0])
    expect = [(1, 0, 0.0)]
    for r in range(2, 9):
        order = np.lexsort((ids, -dmin))
        pick = order[0]
        expect.append((r, int(ids[pick]), round(float(dmin[pick]), 4)))
        dmin = np.minimum(dmin, dist(M, M[pick]))
    got = list(zip(res["round"], res["center_vec_id"], res["sel_dist"]))
    assert got == [(r, c, pytest.approx(d, abs=2e-4)) for r, c, d in expect]
    # farthest-point selection distances are non-increasing after round 2
    sel = res["sel_dist"].to_numpy()[1:]
    assert all(sel[i] >= sel[i + 1] - 1e-9 for i in range(len(sel) - 1))
    # all centers distinct
    assert res["center_vec_id"].nunique() == 8


def test_balanced_downsample_matches_pandas(spark):
    res = (
        _Q["sample_balanced_downsample"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
    )
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    m = ev.groupby("event_type").size().min()
    assert (res["n_kept"] == m).all()
    for et, g in ev.groupby("event_type"):
        assert res.loc[et, "n_orig"] == len(g)
        h = g["event_id"].map(
            lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        kept = g.assign(h=h).sort_values(["h", "event_id"]).head(m)
        exp_mean = (
            np.floor(kept["value"].to_numpy() * 10000).astype("int64").sum()
            / 10000
            / m
        )
        assert res.loc[et, "mean_value_kept"] == pytest.approx(
            round(exp_mean, 4)
        )
        # hash downsampling should not shift the class mean much
        assert res.loc[et, "mean_value_kept"] == pytest.approx(
            res.loc[et, "mean_value_orig"], rel=0.15
        )
