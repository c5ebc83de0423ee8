"""Semantic invariants for wave-98 operators (Bowker symmetry, Page
trend, LOF outliers) — independent python re-derivations from raw
fixture data."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_bowker_matches_python(spark):
    res = _Q["stats_mcnemar_bowker"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    o = o.sort_values(["o_orderdate", "o_orderkey", "o_orderpriority"])
    first = o.groupby("o_custkey").first()["o_orderpriority"].str[0].astype(int)
    last = o.groupby("o_custkey").last()["o_orderpriority"].str[0].astype(int)
    tbl = pd.crosstab(first, last)
    chi = 0.0
    disc = 0
    df = 0
    for i in range(1, 6):
        for j in range(i + 1, 6):
            nij = int(tbl.loc[i, j]) if (i in tbl.index and j in tbl.columns) else 0
            nji = int(tbl.loc[j, i]) if (j in tbl.index and i in tbl.columns) else 0
            if nij + nji > 0:
                chi += (nij - nji) ** 2 / (nij + nji)
                df += 1
            disc += nij + nji
    assert res["n_cust"] == first.size
    assert res["n_discordant"] == disc
    assert res["df"] == df
    assert res["chi2_bowker"] == pytest.approx(chi, abs=1e-3)


def test_page_trend_matches_python(spark):
    res = _Q["stats_page_trend"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )
    cents = (o["o_totalprice"] * 100.0).map(math.floor)
    cell = cents.groupby(
        [o["o_orderdate"].dt.strftime("%Y-%m"), o["o_orderpriority"].str[0].astype(int)]
    ).sum().unstack().dropna()
    ranks = cell.rank(axis=1, method="average")
    rj = ranks.sum()
    l_stat = sum(int(t) * rj[t] for t in rj.index)
    n = len(cell)
    k = 5
    mean_l = n * k * (k + 1) ** 2 / 4
    var_l = n * k**2 * (k + 1) ** 2 * (k - 1) / 144
    assert res["k"] == k and res["n_blocks"] == n
    assert res["page_l"] == pytest.approx(l_stat, abs=0.01)
    assert res["z"] == pytest.approx(
        (l_stat - mean_l) / math.sqrt(var_l), abs=1e-3
    )


def test_lof_matches_numpy(spark):
    res = _Q["profile_lof_outliers"](spark, SF_DIR).toPandas()
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
    d = 1 - dots / np.sqrt(qn[:, None] * qn[None, :])
    n = len(ids)
    k = 10
    knn = {}
    for a in range(n):
        order = sorted(
            (b for b in range(n) if b != a), key=lambda b: (d[a, b], ids[b])
        )[:k]
        knn[a] = order
    kd = {a: max(d[a, b] for b in knn[a]) for a in range(n)}
    rsum = {
        a: math.floor(sum(max(d[a, b], kd[b]) for b in knn[a]) * 1e9) / 1e9
        for a in range(n)
    }
    lrd = {a: 10.0 / max(rsum[a], 1e-12) for a in range(n)}
    lof = {
        a: (
            math.floor(sum(lrd[b] for b in knn[a]) * 1e6) / 1e6 / 10
        )
        / lrd[a]
        for a in range(n)
    }
    top = sorted(range(n), key=lambda a: (-lof[a], ids[a]))[:10]
    got = list(zip(res["vec_id"], res["lof"]))
    for (gid, glof), a in zip(got, top):
        assert gid == ids[a]
        assert glof == pytest.approx(lof[a], abs=2e-3)
    # top LOF sits at/above the ~1 inlier level (this synthetic cloud is
    # near-uniform, so only mild local outliers exist)
    assert res["lof"].iloc[0] >= 1.0
    assert res["lof"].is_monotonic_decreasing
