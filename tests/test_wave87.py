"""Semantic invariants for wave-87 operators (HLL intersection, KMV
Jaccard, sliding distinct count) — independent python re-derivations
from raw fixture data."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hll_intersection_exact_columns_and_sanity(spark):
    res = _Q["sketch_hll_intersection"](spark, SF_DIR).toPandas().iloc[0]
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_partkey", "l_returnflag"]
    )
    li = li[li["l_returnflag"].isin(["R", "A"])]
    r = set(li[li["l_returnflag"] == "R"]["l_partkey"])
    a = set(li[li["l_returnflag"] == "A"]["l_partkey"])
    assert res["exact_intersection"] == len(r & a)
    assert res["exact_union"] == len(r | a)
    # HLL with 512 registers: ~4.6% rse; union estimate within 25%
    assert res["est_union"] == pytest.approx(len(r | a), rel=0.25)
    # inclusion-exclusion intersection is noisy but must be same order
    assert 0.3 < res["inter_ratio"] < 3.0
    # union register merge dominates each side
    assert res["est_union"] >= max(res["est_r"], res["est_a"]) - 1e-6


def test_kmv_jaccard_matches_python(spark):
    res = _Q["sketch_kmv_jaccard"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["source", "text"]
    )
    srcs = sorted(docs["source"].unique())[:2]
    vocab = {}
    for i, s in enumerate(srcs, start=1):
        words = set()
        for t in docs[docs["source"] == s]["text"]:
            words.update(w for w in t.strip().split(" ") if w)
        vocab[i] = words
    a, b = vocab[1], vocab[2]
    j_exact = len(a & b) / len(a | b)
    k = 256
    ha = sorted(_h60(w) for w in a)[:k]
    hb = sorted(_h60(w) for w in b)[:k]
    ku = sorted(set(ha) | set(hb))[:k]
    aset = {_h60(w) for w in a}
    bset = {_h60(w) for w in b}
    both = sum(1 for v in ku if v in aset and v in bset)
    assert res["union_exact"] == len(a | b)
    assert res["inter_exact"] == len(a & b)
    assert res["jaccard_exact"] == pytest.approx(j_exact, abs=1e-6)
    assert res["k_eff"] == len(ku)
    assert res["jaccard_est"] == pytest.approx(both / len(ku), abs=1e-6)
    if len(ku) == k:
        theta = ku[-1] / float(1 << 60)
        assert res["union_est"] == pytest.approx((k - 1) / theta, rel=1e-6)
    else:
        assert res["union_est"] == pytest.approx(len(ku), abs=1e-6)


def test_sliding_distinct_matches_bruteforce(spark):
    res = _Q["win_distinct_sliding"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts"])
    day = (
        (ev["ts"].dt.normalize() - pd.Timestamp("2020-01-01")).dt.days
    ).astype(int)
    ud = set(zip(ev["user_id"], day))
    by_day = defaultdict(set)
    for u, d in ud:
        by_day[d].add(u)
    dmin, dmax = min(by_day), max(by_day)
    expect = []
    for d in range(dmin, dmax + 1):
        users = set()
        for dd in range(d - 6, d + 1):
            users |= by_day.get(dd, set())
        expect.append(
            (
                (pd.Timestamp("2020-01-01") + pd.Timedelta(days=d)).strftime(
                    "%Y-%m-%d"
                ),
                len(users),
            )
        )
    got = list(zip(res["day"], res["distinct_7d"]))
    assert got == expect
