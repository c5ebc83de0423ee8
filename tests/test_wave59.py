"""Semantic invariants for wave-59 operators (k-sample nonparametric
tests: Kruskal–Wallis, Friedman, Cochran's Q) — independent
python/pandas re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_kruskal_wallis_matches_pandas(spark):
    res = _Q["stats_kruskal_wallis"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    r = ev["value"].rank(method="average")
    n = len(ev)
    by = r.groupby(ev["event_type"])
    rj, nj = by.sum(), by.count()
    h = 12.0 / (n * (n + 1)) * float((rj**2 / nj).sum()) - 3 * (n + 1)
    _, t = np.unique(ev["value"].to_numpy(), return_counts=True)
    c = 1.0 - float((t.astype("int64") ** 3 - t).sum()) / (n**3 - n)
    got = res.set_index("event_type")
    for et in rj.index:
        assert got.loc[et, "n"] == nj[et]
        assert got.loc[et, "mean_rank"] == pytest.approx(
            round(rj[et] / nj[et], 4), abs=1e-3
        )
    # per-term floor quantization of R_j^2/n_j costs < 12k/(N(N+1)) on H
    assert res["h_stat"].iloc[0] == pytest.approx(h, abs=1e-4)
    assert res["h_tie_adj"].iloc[0] == pytest.approx(h / c, abs=1e-4)
    assert (res["df"] == len(rj) - 1).all()
    # same-population groups: H should be far from the rejection region
    # only if the fixture actually differs; just require non-negative
    assert res["h_tie_adj"].iloc[0] >= 0.0


def test_friedman_matches_pandas(spark):
    res = _Q["stats_friedman"](spark, SF_DIR).toPandas()
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0).astype("int64")
    df = pd.DataFrame(
        {
            "blk": orders["o_orderdate"].dt.strftime("%Y-%m"),
            "trt": orders["o_orderpriority"],
            "v": cents,
        }
    )
    cell = df.groupby(["blk", "trt"])["v"].sum().unstack()
    cell = cell.dropna()  # complete blocks only
    k = cell.shape[1]
    nb = cell.shape[0]
    ranks = cell.rank(axis=1, method="average")
    r_j = ranks.sum(axis=0)
    a = float((ranks**2).to_numpy().sum())
    c = nb * k * (k + 1) ** 2 / 4.0
    num = float(((r_j - nb * (k + 1) / 2.0) ** 2).sum())
    q = (k - 1) * num / (a - c)
    got = res.set_index("priority")
    for trt in r_j.index:
        assert got.loc[trt, "rank_sum"] == pytest.approx(round(r_j[trt], 1))
        assert got.loc[trt, "mean_rank"] == pytest.approx(
            round(r_j[trt] / nb, 4)
        )
    assert (res["n_blocks"] == nb).all()
    assert (res["df"] == k - 1).all()
    assert res["q_stat"].iloc[0] == pytest.approx(round(q, 6), abs=1e-5)
    assert res["kendall_w"].iloc[0] == pytest.approx(
        round(q / (nb * (k - 1)), 6), abs=1e-6
    )
    # Kendall's W is a [0, 1] concordance coefficient
    assert 0.0 <= res["kendall_w"].iloc[0] <= 1.0


def test_cochran_q_matches_python(spark):
    res = _Q["stats_cochran_q"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    pos = ev[ev["value"] >= 150.0][["user_id", "event_type"]].drop_duplicates()
    c_j = pos.groupby("event_type").size()
    r_i = pos.groupby("user_id").size()
    k = len(c_j)
    n_tot = int(r_i.sum())
    r_sq = int((r_i**2).sum())
    num = int(((k * c_j - n_tot) ** 2).sum())
    q = (k - 1) * num / (k * (k * n_tot - r_sq))
    got = res.set_index("event_type")
    for et in c_j.index:
        assert got.loc[et, "n_positive"] == c_j[et]
    assert (res["n_subjects"] == len(r_i)).all()
    assert (res["df"] == k - 1).all()
    assert res["q_stat"].iloc[0] == pytest.approx(round(q, 6))
    assert res["q_stat"].iloc[0] >= 0.0
