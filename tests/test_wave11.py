"""Semantic invariants for wave-11 operators (Brown-Forsythe Levene,
ratio-of-sums pitfall, perceptual-hash near-dup, span-level dedup)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_levene_matches_numpy(spark):
    res = _Q["stats_levene"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    q100 = np.floor(li["l_quantity"].values * 100.0)
    flags = li["l_returnflag"].values
    zs = []
    for f in ("A", "N", "R"):
        v = q100[flags == f]
        zs.append(np.abs(2 * v - 2 * np.median(v)))
    n = sum(len(z) for z in zs)
    k = 3
    gm = np.concatenate(zs).mean()
    ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in zs)
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    assert res.loc[0, "n"] == n
    assert res.loc[0, "f_stat"] == pytest.approx(f_stat, abs=1e-5)


def test_ratio_of_sums_dominates_when_rates_correlate(spark):
    res = _Q["agg_ratio_of_sums"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    for _, row in res.iterrows():
        g = li[li["l_returnflag"] == row["l_returnflag"]]
        ros = (g["l_extendedprice"] * g["l_discount"]).sum() / g[
            "l_extendedprice"
        ].sum()
        aor = g["l_discount"].mean()
        assert row["ratio_of_sums"] == pytest.approx(ros, abs=1e-4)
        assert row["avg_of_ratios"] == pytest.approx(aor, abs=1e-4)


def _phash(text: str) -> list[int]:
    n = len(text)
    px = [ord(text[(i * n) // 64]) for i in range(64)]
    total = sum(px)
    bits = [1 if 64 * p > total else 0 for p in px]
    return [
        sum(bits[b * 8 + i] << i for i in range(8)) for b in range(8)
    ]


def test_phash_banded_equals_bruteforce(spark):
    res = _Q["mm_phash_neardup"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sigs = {r.doc_id: _phash(r.text) for r in docs.itertuples()}
    ids = sorted(sigs)
    brute = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = sum(
                bin(x ^ y).count("1") for x, y in zip(sigs[a], sigs[b])
            )
            if h <= 7:
                brute.append((a, b, h))
    got = sorted(map(tuple, res[["doc_a", "doc_b", "hamming"]].values))
    assert got == sorted(brute)


def test_dedup_paragraph_matches_pandas(spark):
    res = _Q["dedup_paragraph"](spark, SF_DIR).toPandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    occs = []
    for r in docs.itertuples():
        toks = r.text.strip().split(" ")
        for j in range(len(toks) // 8):
            occs.append((r.doc_id, j, " ".join(toks[j * 8 : j * 8 + 8])))
    df = pd.DataFrame(occs, columns=["doc_id", "j", "chunk"])
    df["occ"] = df.sort_values(["doc_id", "j"]).groupby("chunk").cumcount() + 1
    agg = df.groupby("doc_id").agg(
        n_spans=("chunk", "size"), removed_spans=("occ", lambda s: (s > 1).sum())
    )
    assert res["n_spans"].sort_index().equals(agg["n_spans"].sort_index())
    assert (
        res["removed_spans"]
        .sort_index()
        .equals(agg["removed_spans"].sort_index().astype("int64"))
    )
    # a span removed in one doc must have survived in an earlier one
    assert (res["removed_spans"] <= res["n_spans"]).all()
    assert res["removed_spans"].sum() < res["n_spans"].sum()
