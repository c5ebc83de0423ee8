"""Semantic invariants for wave-62 operators (HITS bipartite, Katz path
counts, rich-club coefficient) — independent pandas re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from hive_processor_spark.operators.graphs import _knn_edges_pinned
from tests.conftest import SF_DIR

_Q = queries()


def _purchase_edges():
    orders = pd.read_parquet(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = pd.read_parquet(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    e = li.merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )[["o_custkey", "l_suppkey"]].drop_duplicates()
    return e.rename(columns={"o_custkey": "c", "l_suppkey": "s"})


def _quant(series: pd.Series) -> pd.Series:
    return np.floor(series * 1000000.0 / series.max()).astype("int64")


def test_hits_matches_pandas(spark):
    res = _Q["graph_hits_bipartite"](spark, SF_DIR).toPandas()
    e = _purchase_edges()
    a1q = _quant(e.groupby("s").size().astype("int64"))
    h1 = e.join(a1q.rename("q"), on="s").groupby("c")["q"].sum()
    h1q = _quant(h1)
    a2 = e.join(h1q.rename("q"), on="c").groupby("s")["q"].sum()
    a2q = _quant(a2)
    for role, scores in (("authority", a2q), ("hub", h1q)):
        got = res[res["role"] == role].sort_values("rn")
        exp = scores.reset_index()
        exp.columns = ["node", "q"]
        exp = exp.sort_values(["q", "node"], ascending=[False, True]).head(15)
        assert list(got["node"]) == list(exp["node"])
        assert list(got["score"]) == [round(q / 1e6, 6) for q in exp["q"]]
    assert res["score"].max() == 1.0  # max-normalized each sweep


def test_katz_matches_pandas(spark):
    res = _Q["graph_katz_paths"](spark, SF_DIR).toPandas()
    e = _purchase_edges()
    w1 = e.groupby("s").size().astype("int64")
    dc = e.groupby("c").size().astype("int64")
    w2 = e.join(dc.rename("d"), on="c").groupby("s")["d"].sum()
    cw = e.join(w1.rename("w"), on="s").groupby("c")["w"].sum()
    w3 = e.join(cw.rename("cw"), on="c").groupby("s")["cw"].sum()
    katz = (100 * w1 + 10 * w2 + w3).sort_values(ascending=False)
    frame = pd.DataFrame(
        {"katz_q": katz, "node": katz.index}
    ).sort_values(["katz_q", "node"], ascending=[False, True]).head(20)
    assert list(res["l_suppkey"]) == list(frame["node"])
    assert list(res["katz_q"]) == list(frame["katz_q"])
    top = res.iloc[0]
    assert top["katz_q"] == 100 * top["walks_1"] + 10 * top["walks_2"] + top["walks_3"]


def test_rich_club_matches_pandas(spark):
    res = _Q["graph_rich_club"](spark, SF_DIR).toPandas()
    edges = _knn_edges_pinned(spark, SF_DIR).toPandas()
    deg = edges.groupby("src").size()
    for _, row in res.iterrows():
        k = row["k"]
        club = set(deg[deg > k].index)
        n_k = len(club)
        e_k = int(
            (edges["src"].isin(club) & edges["dst"].isin(club)).sum() // 2
        )
        assert row["n_k"] == n_k
        assert row["e_k"] == e_k
        assert row["phi"] == pytest.approx(
            round(2.0 * e_k / (n_k * (n_k - 1)), 6)
        )
    # phi is a density: bounded [0, 1]; club size shrinks with k
    assert res["phi"].between(0, 1).all()
    assert res["n_k"].is_monotonic_decreasing
