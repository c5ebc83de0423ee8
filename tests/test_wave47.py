"""Semantic invariants for wave-47 operators (Granger screen, LDA probe,
largest-remainder allocation) — independent numpy re-implementations on
top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_granger_matches_numpy(spark):
    res = _Q["ts_granger_lite"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    x = (
        (li["l_extendedprice"] * 100.0).apply(np.floor).astype("int64")
        .groupby(li["l_shipdate"].dt.date).sum() // 100
    )
    y = (
        (orders["o_totalprice"] * 100.0).apply(np.floor).astype("int64")
        .groupby(orders["o_orderdate"].dt.date).sum() // 100
    )
    j = pd.DataFrame({"x": x, "y": y}).dropna().sort_index()
    yv = j["y"].to_numpy().astype(float)
    xv = j["x"].to_numpy().astype(float)
    Y, yl, xl = yv[1:], yv[:-1], xv[1:-0] if False else xv[:-1]
    n = len(Y)
    # restricted: Y ~ yl; full: Y ~ yl + xl (with intercepts)
    X1 = np.column_stack([np.ones(n), yl])
    X2 = np.column_stack([np.ones(n), yl, xl])
    b1 = np.linalg.lstsq(X1, Y, rcond=None)[0]
    b2 = np.linalg.lstsq(X2, Y, rcond=None)[0]
    sse_r = ((Y - X1 @ b1) ** 2).sum()
    sse_f = ((Y - X2 @ b2) ** 2).sum()
    fstat = (sse_r - sse_f) / (sse_f / (n - 3))
    assert res["n"] == n
    assert res["sse_restricted"] == pytest.approx(sse_r, rel=1e-6)
    assert res["sse_full"] == pytest.approx(sse_f, rel=1e-6)
    assert res["granger_f"] == pytest.approx(fstat, abs=1e-2)
    assert res["x_helps_predict_y"] == int(fstat > 3.85)
    # SSE can only fall when a regressor is added
    assert res["sse_full"] <= res["sse_restricted"]


def test_lda_probe_matches_numpy(spark):
    res = _Q["ml_lda_probe"](spark, SF_DIR).toPandas().iloc[0]
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    sub = emb[emb["label"].isin([0, 1])]
    f = np.stack(sub["embedding"].to_numpy())[:, :2].astype(np.float64)
    fq = np.floor(f * 1e6)
    lab = sub["label"].to_numpy()
    m0, m1 = fq[lab == 0].mean(axis=0), fq[lab == 1].mean(axis=0)
    Sw = np.zeros((2, 2))
    for c, mc in ((0, m0), (1, m1)):
        d = fq[lab == c] - mc
        Sw += d.T @ d
    w = np.linalg.solve(Sw, m1 - m0)
    proj = fq @ w
    thresh = w @ (m0 + m1) / 2
    pos_is_1 = (w @ (m1 - m0)) >= 0
    pred = (proj >= thresh).astype(int) if pos_is_1 else (proj < thresh).astype(int)
    acc = (pred == lab).mean()
    assert res["n"] == len(sub)
    assert res["n_class1"] == (lab == 1).sum()
    assert res["lda_accuracy"] == pytest.approx(acc, abs=1e-6)
    # isotropic random embeddings: linear probe can be lucky on a small
    # sample but must stay far from perfect separation
    assert res["lda_accuracy"] < 0.9


def test_largest_remainder_matches_python(spark):
    res = _Q["agg_largest_remainder"](spark, SF_DIR).toPandas().set_index("n_name")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    cents = (
        np.floor(j["o_totalprice"] * 100)
        .astype("int64")
        .groupby(j["n_name"])
        .sum()
    )
    t = int(cents.sum())
    floors = {k: int(v) * 10000 // t for k, v in cents.items()}
    rems = {k: int(v) * 10000 % t for k, v in cents.items()}
    leftover = 10000 - sum(floors.values())
    order = sorted(rems, key=lambda k: (-rems[k], k))
    alloc = dict(floors)
    for k in order[:leftover]:
        alloc[k] += 1
    for name, bp in alloc.items():
        row = res.loc[name]
        assert row["basis_points"] == bp
        assert row["total_allocated"] == 10000
    # exactness: shares sum to precisely 10000 basis points
    assert res["basis_points"].sum() == 10000
