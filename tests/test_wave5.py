"""Semantic invariants for the wave-5 operators (boilerplate shingles,
log2 histogram, fair allocation) — independent pandas/numpy recomputation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _doc_shingles(text: str, n: int = 5) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def test_boilerplate_matches_bruteforce(spark):
    res = _Q["text_boilerplate_shingles"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    sh = {r.doc_id: _doc_shingles(r.text) for r in docs.itertuples()}
    df: dict[str, int] = {}
    for s in sh.values():
        for g in s:
            df[g] = df.get(g, 0) + 1
    rows = []
    for doc_id, s in sh.items():
        if not s:
            continue
        common = sum(1 for g in s if df[g] >= 3)
        rows.append((doc_id, len(s), common, common / len(s)))
    bf = pd.DataFrame(
        rows, columns=["doc_id", "n_shingles", "n_common", "ratio"]
    ).sort_values(["ratio", "doc_id"], ascending=[False, True]).head(20)
    assert list(res["doc_id"]) == list(bf["doc_id"])
    assert list(res["n_shingles"]) == list(bf["n_shingles"])
    assert list(res["n_common"]) == list(bf["n_common"])
    assert np.allclose(res["boilerplate_ratio"], bf["ratio"].round(6))


def test_log2_histogram_matches_numpy(spark):
    res = _Q["agg_log2_histogram"](spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")
    x = li["l_extendedprice"].values
    bucket = np.frompyfunc(lambda v: int(v).bit_length(), 1, 1)(x).astype(int)
    bf = pd.DataFrame({"b": bucket, "x": x}).groupby("b").agg(
        n=("x", "size"), s=("x", "sum")
    )
    assert res["n"].sum() == len(x)
    for _, r in res.iterrows():
        assert bf.loc[r["log2_bucket"], "n"] == r["n"]
        assert r["bucket_floor"] == 2 ** (r["log2_bucket"] - 1)
        # floor-quantized at 1e-2 per addend
        assert r["sum_value"] == pytest.approx(
            bf.loc[r["log2_bucket"], "s"], abs=r["n"] * 0.01 + 1
        )


def test_fair_allocation_properties(spark):
    res = _Q["pipeline_fair_allocation"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    demand = docs.assign(tok=docs["text"].str.split(" ").str.len()).groupby(
        "source"
    )["tok"].sum()
    budget = int(np.floor(0.5 * demand.sum()))
    # demands reproduced exactly
    for _, r in res.iterrows():
        assert demand[r["source"]] == r["demand"]
    # feasibility: total allocation within budget (floor slack < n sources)
    assert res["allocation"].sum() <= budget
    assert res["allocation"].sum() >= budget - len(res)
    # no allocation exceeds demand; max-min fairness: every capped source
    # gets the same water level, and every satisfied demand is below it
    assert (res["allocation"] <= res["demand"]).all()
    capped = res[~res["fully_satisfied"]]
    if len(capped):
        level = capped["allocation"].iloc[0]
        assert (capped["allocation"] == level).all()
        assert (res[res["fully_satisfied"]]["demand"] <= level + 1).all()
