"""Semantic invariants for wave-45 operators (newsvendor fractile,
James-Stein shrinkage, curriculum staging) — independent python/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_newsvendor_matches_numpy(spark):
    res = _Q["agg_newsvendor"](spark, SF_DIR).toPandas().set_index("scenario")
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    demand = orders.groupby(orders["o_orderdate"].dt.date).size().sort_index()
    by_val = demand.sort_values(kind="stable")
    # tie-break by day within equal demand: sort by (demand, day)
    pairs = sorted(zip(demand.values, demand.index))
    n = len(pairs)
    for scen, cu, co in [
        ("understock_9to1", 9.0, 1.0),
        ("balanced_1to1", 1.0, 1.0),
        ("overstock_1to9", 1.0, 9.0),
    ]:
        cf = cu / (cu + co)
        k = math.ceil(cf * n)
        q = pairs[k - 1][0]
        row = res.loc[scen]
        assert row["critical_fractile"] == pytest.approx(cf, abs=1e-4)
        assert row["order_quantity"] == q
    # monotone: higher fractile → stock at least as much
    r = res.sort_values("critical_fractile")
    assert r["order_quantity"].is_monotonic_increasing


def test_james_stein_matches_numpy(spark):
    res = _Q["stats_james_stein"](spark, SF_DIR).toPandas().set_index("n_name")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    nat = pd.read_parquet(f"{SF_DIR}/nation.parquet").set_index("n_nationkey")
    means = {}
    for nk, grp in cust.groupby("c_nationkey"):
        cents = np.floor(grp["c_acctbal"].to_numpy() * 100).astype("int64")
        means[nk] = cents.sum() / 100.0 / len(grp)
    k = len(means)
    gm = np.floor(np.array(list(means.values())) * 100).astype("int64").sum() / 100.0 / k
    keep = max(0.0, 1.0 - (k - 3) / (k - 1))
    for nk, m in means.items():
        row = res.loc[nat.loc[nk, "n_name"]]
        assert row["raw_mean"] == pytest.approx(m, abs=0.01)
        assert row["js_mean"] == pytest.approx(gm + keep * (m - gm), abs=0.02)
        assert row["keep_frac"] == pytest.approx(keep, abs=1e-6)
    # shrinkage moves every estimate strictly toward the pool
    assert (
        (res["js_mean"] - gm).abs() <= (res["raw_mean"] - gm).abs() + 1e-6
    ).all()


def test_curriculum_matches_python(spark):
    res = _Q["pipeline_curriculum"](spark, SF_DIR).toPandas().set_index("stage")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    rows = []
    for r in docs.itertuples():
        toks = [t for t in r.text.split(" ") if t]
        syls = [max(1, len(re.findall(r"[aeiouy]+", t))) for t in toks]
        diff_q = math.floor(sum(syls) / len(toks) * 1e6)
        rows.append((r.doc_id, len(toks), diff_q))
    rows.sort(key=lambda t: (t[2], t[0]))
    n = len(rows)
    sizes = [n // 4 + (1 if i < n % 4 else 0) for i in range(4)]
    start = 0
    for stage, size in enumerate(sizes, 1):
        seg = rows[start : start + size]
        start += size
        row = res.loc[stage]
        assert row["n_docs"] == size
        assert row["token_budget"] == sum(w for _, w, _ in seg)
        assert row["min_difficulty"] == pytest.approx(
            min(d for _, _, d in seg) / 1e6, abs=1e-4
        )
        assert row["max_difficulty"] == pytest.approx(
            max(d for _, _, d in seg) / 1e6, abs=1e-4
        )
    # stages are ordered by difficulty
    assert res["min_difficulty"].is_monotonic_increasing
