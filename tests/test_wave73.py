"""Semantic invariants for wave-73 operators (label conductance,
prequential accuracy) — independent pandas re-derivations."""

from __future__ import annotations

import pandas as pd
import pytest

from hive_processor_spark import queries
from hive_processor_spark.operators.graphs import _knn_edges_pinned
from tests.conftest import SF_DIR

_Q = queries()


def test_label_conductance_matches_pandas(spark):
    res = (
        _Q["graph_label_conductance"](spark, SF_DIR)
        .toPandas()
        .set_index("label")
    )
    edges = _knn_edges_pinned(spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    lab = emb[emb["vec_id"] < 200].set_index("vec_id")["label"]
    e = edges.assign(
        ls=edges["src"].map(lab).astype(int), ld=edges["dst"].map(lab).astype(int)
    )
    vol_all = len(e)
    for lbl, g in e.groupby("ls"):
        vol = len(g)
        cut = int((g["ld"] != lbl).sum())
        row = res.loc[lbl]
        assert row["vol"] == vol
        assert row["cut"] == cut
        assert row["conductance"] == pytest.approx(
            round(cut / min(vol, vol_all - vol), 6)
        )
    # conductance is a [0,1] ratio; symmetric edge list => cut <= vol
    assert res["conductance"].between(0, 1).all()
    # total cut volume is symmetric across the partition
    assert res["cut"].sum() % 2 == 0


def test_prequential_accuracy_matches_pandas(spark):
    res = _Q["ml_prequential_accuracy"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    ev["ok"] = (ev["value"] >= 100.0) == (ev["event_type"] == "purchase")
    daily = (
        ev.groupby("day")
        .agg(n=("ok", "size"), correct=("ok", "sum"))
        .sort_index()
    )
    assert list(res["day"]) == list(daily.index)
    assert list(res["n"]) == list(daily["n"])
    assert list(res["correct"]) == list(daily["correct"])
    cum_n = daily["n"].cumsum()
    cum_c = daily["correct"].cumsum()
    for i, day in enumerate(daily.index):
        assert res["day_accuracy"].iloc[i] == pytest.approx(
            round(daily["correct"].iloc[i] / daily["n"].iloc[i], 6)
        )
        assert res["prequential_accuracy"].iloc[i] == pytest.approx(
            round(cum_c.iloc[i] / cum_n.iloc[i], 6)
        )
    # the final prequential point is the overall accuracy
    assert res["prequential_accuracy"].iloc[-1] == pytest.approx(
        round(ev["ok"].mean(), 6)
    )
