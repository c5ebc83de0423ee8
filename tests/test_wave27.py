"""Semantic invariants for wave-27 operators (Haar energy, Markov entropy
rate, Burrows' Delta, FD discovery) — independent pandas/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_haar_energy_matches_numpy(spark):
    res = _Q["ts_haar_energy"](spark, SF_DIR).toPandas().set_index("level")
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    x = (
        (li["l_extendedprice"] * 100.0)
        .apply(np.floor)
        .astype("int64")
        .groupby(li["l_shipdate"].dt.date)
        .sum()
        .sort_index()
        .to_numpy()
    )
    for lvl in (1, 2, 3):
        blk = 2 * 2 ** (lvl - 1)
        nb = len(x) // blk
        e = 0
        for b in range(nb):
            seg = x[b * blk : (b + 1) * blk]
            d = (int(seg[: blk // 2].sum()) - int(seg[blk // 2 :].sum())) / (
                2**lvl
            ) / 100.0
            e += math.floor(d * d)
        row = res.loc[lvl]
        assert row["block_days"] == blk
        assert row["n_blocks"] == nb
        assert row["detail_energy"] == e
    # finer scales hold at least as many blocks
    assert res["n_blocks"].is_monotonic_decreasing


def test_markov_entropy_matches_python(spark):
    res = _Q["events_markov_entropy"](spark, SF_DIR).toPandas().set_index("state")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts"]
    )
    trans: Counter = Counter()
    for _u, g in ev.groupby("user_id"):
        ts = g["event_type"].tolist()
        trans.update(zip(ts, ts[1:]))
    rowtot: Counter = Counter()
    for (a, _b), c in trans.items():
        rowtot[a] += c
    n = sum(trans.values())
    h_qs = {}
    for a in rowtot:
        hq = sum(
            math.floor(-c / rowtot[a] * math.log2(c / rowtot[a]) * 1e9)
            for (x, _b), c in trans.items()
            if x == a
        )
        h_qs[a] = hq
    rate = sum(
        math.floor(rowtot[a] / n * h_qs[a] / 1e3) for a in rowtot
    ) / 1e6
    for a in rowtot:
        row = res.loc[a]
        assert row["n_transitions"] == rowtot[a]
        assert row["stationary_weight"] == pytest.approx(rowtot[a] / n, abs=1e-6)
        assert row["row_entropy_bits"] == pytest.approx(h_qs[a] / 1e9, abs=1e-6)
        assert row["entropy_rate_bits"] == pytest.approx(rate, abs=1e-6)
    # 5 near-uniform event types: entropy near but below log2(5)
    assert 1.5 < res["entropy_rate_bits"].iloc[0] <= math.log2(5) + 1e-9


def test_stylometry_delta_matches_python(spark):
    res = (
        _Q["text_stylometry_delta"](spark, SF_DIR)
        .toPandas()
        .set_index(["lang_a", "lang_b"])
    )
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.assign(toks=docs["text"].str.split(" "))
    allc: Counter = Counter()
    per_lang: dict[str, Counter] = {}
    ntok: Counter = Counter()
    for r in toks.itertuples():
        ts = [t for t in r.toks if t]
        allc.update(ts)
        per_lang.setdefault(r.lang, Counter()).update(ts)
        ntok[r.lang] += len(ts)
    top = sorted(allc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    langs = sorted(per_lang)
    zmat = {}
    for t, _c in top:
        fq = [
            math.floor(per_lang[lg][t] * 1000000.0 / ntok[lg]) for lg in langs
        ]
        k = len(fq)
        mean = sum(fq) / k
        varn = sum(v * v for v in fq) - sum(fq) ** 2 / k
        if varn <= 0:
            continue
        sd = math.sqrt(varn / (k - 1))
        zmat[t] = {lg: (v - mean) / sd for lg, v in zip(langs, fq)}
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            dq = sum(
                math.floor(abs(z[la] - z[lb]) * 1e6) for z in zmat.values()
            )
            row = res.loc[(la, lb)]
            assert row["n_words"] == len(zmat)
            assert row["burrows_delta"] == pytest.approx(
                dq / 1e6 / len(zmat), abs=1e-6
            )
    assert (res["burrows_delta"] > 0).all()


def test_fd_discovery_matches_pandas(spark):
    res = _Q["profile_fd_discovery"](spark, SF_DIR).toPandas().set_index("fd")
    cases = [
        ("nation", "n_nationkey", "n_name", True),
        ("nation", "n_regionkey", "n_name", False),
        ("orders", "o_orderkey", "o_custkey", True),
        ("orders", "o_custkey", "o_orderpriority", None),
        ("lineitem", "l_orderkey", "l_returnflag", None),
        ("documents", "doc_id", "lang", True),
        ("documents", "source", "lang", None),
    ]
    for tbl, lhs, rhs, expect in cases:
        df = pd.read_parquet(f"{SF_DIR}/{tbl}.parquet")
        lhs_ndv = df[lhs].nunique()
        pair_ndv = df[[lhs, rhs]].drop_duplicates().shape[0]
        row = res.loc[f"{lhs}->{rhs}"]
        assert row["lhs_ndv"] == lhs_ndv
        assert row["pair_ndv"] == pair_ndv
        assert row["holds"] == int(pair_ndv == lhs_ndv)
        if expect is not None:
            assert bool(row["holds"]) is expect
        assert row["strength"] == pytest.approx(lhs_ndv / pair_ndv, abs=1e-6)
