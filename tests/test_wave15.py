"""Semantic invariants for wave-15 operators (Kendall tau-b, Cramér's V,
Bollinger bands, local clustering coefficient) — each checked against an
independent numpy/pandas re-implementation on top of the DuckDB hash gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _kendall_tau_b(x: np.ndarray, y: np.ndarray) -> tuple[int, int, float]:
    n = len(x)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = np.sign(x[i] - x[j])
            sy = np.sign(y[i] - y[j])
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
    n0 = n * (n - 1) // 2
    tau = (c - d) / np.sqrt((n0 - tx) * (n0 - ty))
    return c, d, tau


def test_kendall_tau_matches_naive_pair_count(spark):
    res = _Q["stats_kendall_tau"](spark, SF_DIR).toPandas().set_index("n_name")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    oc = orders.groupby("o_custkey").size()
    cust = cust.assign(y=cust["c_custkey"].map(oc).fillna(0).astype(int))
    assert len(res) == 25
    for nk, grp in cust.groupby("c_nationkey"):
        name = nat.loc[nat["n_nationkey"] == nk, "n_name"].iloc[0]
        c, d, tau = _kendall_tau_b(
            grp["c_acctbal"].to_numpy(), grp["y"].to_numpy()
        )
        row = res.loc[name]
        assert row["n_customers"] == len(grp)
        assert row["concordant"] == c
        assert row["discordant"] == d
        assert row["tau_b"] == pytest.approx(tau, abs=2e-6)
    # ranks of a near-random pairing: |tau| should be modest, never ±1
    assert res["tau_b"].abs().max() < 0.9


def test_cramers_v_matches_numpy_chi2(spark):
    res = _Q["stats_cramers_v"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    ct = pd.crosstab(orders["o_orderpriority"], orders["o_orderstatus"])
    obs = ct.to_numpy().astype(float)
    n = obs.sum()
    exp = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / n
    chi2 = ((obs - exp) ** 2 / exp).sum()
    r, c = obs.shape
    v = np.sqrt(chi2 / (n * (min(r, c) - 1)))
    assert res["n"] == n
    assert (res["n_rows"], res["n_cols"]) == (r, c)
    assert res["dof"] == (r - 1) * (c - 1)
    # engine floor-quantizes per-cell terms at 1e-6: bounded downward drift
    assert res["chi2"] == pytest.approx(chi2, abs=r * c * 1e-6 + 1e-4)
    assert res["cramers_v"] == pytest.approx(v, abs=1e-4)
    assert 0.0 <= res["cramers_v"] <= 1.0


def test_bollinger_matches_pandas_rolling(spark):
    res = _Q["ts_bollinger"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    cents = (
        (li["l_extendedprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(li["l_shipdate"].dt.date)
        .sum()
        .sort_index()
    )
    dollars = (cents // 100).astype("int64")
    ma = cents.rolling(20).sum() / 2000.0
    s = dollars.rolling(20).sum()
    ss = (dollars * dollars).rolling(20).sum()
    sd = np.sqrt((20 * ss - s * s) / 380.0)
    ref = pd.DataFrame({"ma": ma, "sd": sd, "rev": cents / 100.0}).dropna()
    assert len(res) == len(ref)
    got = res.set_index(pd.to_datetime(res["day"]).dt.date)
    assert np.allclose(got["ma20"], ref["ma"], atol=1e-3)
    assert np.allclose(got["sd20"], ref["sd"], atol=1e-3)
    assert np.allclose(got["upper_band"], ref["ma"] + 2 * ref["sd"], atol=1e-3)
    breach_ref = np.where(
        ref["rev"] > ref["ma"] + 2 * ref["sd"],
        1,
        np.where(ref["rev"] < ref["ma"] - 2 * ref["sd"], -1, 0),
    )
    assert (got["breach"].to_numpy() == breach_ref).all()
    # a ±2σ band must contain the vast majority of observations
    assert (got["breach"] == 0).mean() > 0.8


def test_clustering_coeff_matches_networkx_free_recompute(spark):
    res = (
        _Q["graph_clustering_coeff"](spark, SF_DIR)
        .toPandas()
        .set_index("node")
    )
    # rebuild the same 3-NN graph in numpy (quantized cosine, dst tie-break)
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb[emb["vec_id"] < 200].sort_values("vec_id")
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    # replicate functions/vector.py quantized kernels exactly
    norms = np.floor(v * v * 1e12).sum(axis=1) / 1e12
    n = len(v)
    sims = np.empty((n, n))
    for i in range(n):
        sims[i] = np.floor(v[i] * v * 1e12).sum(axis=1) / 1e12
    sims = sims / np.sqrt(np.outer(norms, norms))
    edges = set()
    ids = emb["vec_id"].to_numpy()
    for i in range(len(ids)):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[i, j], ids[j]),
        )[:3]
        for j in order:
            edges.add((ids[i], ids[j]))
            edges.add((ids[j], ids[i]))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    for node, nbrs in adj.items():
        deg = len(nbrs)
        tri = sum(
            1
            for b in nbrs
            for c in nbrs
            if b < c and c in adj[b]
        )
        row = res.loc[node]
        assert row["degree"] == deg
        assert row["triangles"] == tri
        expect = 2.0 * tri / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert row["clustering_coeff"] == pytest.approx(expect, abs=1e-6)
    assert set(res.index) == set(adj)
