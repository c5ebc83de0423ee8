"""Semantic invariants for wave 165 (Blomqvist beta, Goodman-Kruskal
lambda, Holm step-down, Hartley/Cochran variance screens, Woolf
homogeneity) against numpy / pandas / stdlib-NormalDist references."""

from __future__ import annotations

import math
from statistics import NormalDist

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()
_PHI = NormalDist().cdf


def _disc_median(a):
    a = np.sort(a)
    return a[math.ceil(0.5 * len(a)) - 1]


def test_blomqvist_beta_matches_numpy(spark):
    res = _Q["stats_blomqvist_beta"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    )
    q = li.l_quantity.to_numpy().astype(np.int64)
    p = np.floor(li.l_extendedprice.to_numpy() * 100.0).astype(np.int64)
    mq, mp = _disc_median(q), _disc_median(p)
    sq = np.sign(q - mq)
    sp = np.sign(p - mp)
    conc = int(((sq * sp) == 1).sum())
    disc = int(((sq * sp) == -1).sum())
    onm = int(((sq == 0) | (sp == 0)).sum())
    assert res.concordant == conc
    assert res.discordant == disc
    assert res.on_median == onm
    assert res.blomqvist_beta == pytest.approx(
        (conc - disc) / (conc + disc), abs=1e-6
    )


def test_gk_lambda_matches_pandas(spark):
    res = _Q["stats_gk_lambda"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus"],
    )
    ct = pd.crosstab(o.o_orderpriority, o.o_orderstatus).to_numpy()
    n = ct.sum()
    srm = ct.max(axis=1).sum()  # predict status knowing priority
    scm = ct.max(axis=0).sum()  # predict priority knowing status
    mc = ct.sum(axis=0).max()
    mr = ct.sum(axis=1).max()
    assert res.n_orders == n
    assert res.lambda_status_given_priority == pytest.approx(
        (srm - mc) / (n - mc), abs=1e-6
    )
    assert res.lambda_priority_given_status == pytest.approx(
        (scm - mr) / (n - mr), abs=1e-6
    )
    assert res.lambda_symmetric == pytest.approx(
        (srm + scm - mc - mr) / (2 * n - mc - mr), abs=1e-6
    )


def test_holm_bonferroni_matches_stdlib(spark):
    res = (
        _Q["stats_holm_bonferroni"](spark, SF_DIR)
        .toPandas()
        .set_index("segment")
        .sort_index()
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    )
    x = np.floor(c.c_acctbal.to_numpy() * 100.0).astype(np.int64)
    seg = c.c_mktsegment.to_numpy()
    segs = np.sort(np.unique(seg))
    k = len(segs)
    praw = {}
    for s in segs:
        a, b = x[seg == s], x[seg != s]
        z = (a.mean() - b.mean()) / math.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        praw[s] = 2.0 * (1.0 - _PHI(abs(z)))
    order = sorted(segs, key=lambda s: (praw[s], s))
    running, holm = 0.0, {}
    for i, s in enumerate(order, start=1):
        running = max(running, min((k - i + 1) * praw[s], 1.0))
        holm[s] = running
    for s in segs:
        assert res.loc[s].p_raw == pytest.approx(praw[s], abs=2e-5)
        assert res.loc[s].p_holm == pytest.approx(holm[s], abs=1e-4)
        assert res.loc[s].reject_5pct == int(holm[s] < 0.05)


def test_hartley_cochran_matches_numpy(spark):
    res = _Q["stats_hartley_cochran"](spark, SF_DIR).toPandas().iloc[0]
    o = pd.read_parquet(
        f"{SF_DIR}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )
    cents = np.floor(o.o_totalprice.to_numpy() * 100.0).astype(np.int64)
    pr = o.o_orderpriority.to_numpy()
    groups = np.sort(np.unique(pr))
    v = {g: cents[pr == g].var(ddof=1) for g in groups}
    vals = np.array(list(v.values()))
    assert res.k_groups == len(groups)
    assert res.n_min == min((pr == g).sum() for g in groups)
    assert res.n_max == max((pr == g).sum() for g in groups)
    assert res.group_max_var == max(groups, key=lambda g: v[g])
    assert res.hartley_fmax == pytest.approx(
        vals.max() / vals.min(), abs=1e-3
    )
    assert res.cochran_c == pytest.approx(vals.max() / vals.sum(), abs=1e-5)


def test_woolf_matches_numpy(spark):
    res = _Q["stats_woolf_test"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_returnflag"],
    )
    li = li[li.l_returnflag.isin(["R", "A"])]
    yr = pd.to_datetime(li.l_shipdate).dt.year.to_numpy()
    exp = (li.l_discount.to_numpy() >= 0.05).astype(int)
    out = (li.l_returnflag == "R").to_numpy().astype(int)
    ys, ws = [], []
    for y in np.unique(yr):
        m = yr == y
        a = ((exp == 1) & (out == 1) & m).sum() + 0.5
        b = ((exp == 1) & (out == 0) & m).sum() + 0.5
        c = ((exp == 0) & (out == 1) & m).sum() + 0.5
        d = ((exp == 0) & (out == 0) & m).sum() + 0.5
        ys.append(math.log(a * d / (b * c)))
        ws.append(1.0 / (1 / a + 1 / b + 1 / c + 1 / d))
    ys, ws = np.array(ys), np.array(ws)
    chi2 = float((ws * ys**2).sum() - (ws * ys).sum() ** 2 / ws.sum())
    assert res.n_strata == len(ys)
    assert res.df == len(ys) - 1
    assert res.ln_or_pooled == pytest.approx(
        float((ws * ys).sum() / ws.sum()), abs=1e-5
    )
    assert res.woolf_chi2 == pytest.approx(chi2, abs=1e-3)
