"""Semantic invariants for wave-7 operators (null-aware anti semantics,
rolling regression, user entropy, IVF cell stats)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_not_in_null_semantics(spark):
    row = _Q["join_not_in_null_aware"](spark, SF_DIR).toPandas().iloc[0]
    # one NULL in the list poisons every NOT IN comparison -> zero rows
    assert row["not_in_with_null"] == 0
    # NOT EXISTS ignores NULLs and equals the cleaned NOT IN
    assert row["not_in_clean"] == row["not_exists"]
    assert row["not_in_clean"] > 0


def test_rolling_slope_matches_numpy(spark):
    res = _Q["win_rolling_slope"](spark, SF_DIR).toPandas()
    o = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    day = (
        o["o_orderdate"].values.astype("datetime64[s]").astype("int64") // 86400
    )
    cents = np.floor(o["o_totalprice"].values * 100).astype("int64")
    daily = pd.DataFrame({"d": day, "yc": cents}).groupby("d")["yc"].sum()
    d = daily.index.values.astype(float)
    y = daily.values.astype(float)
    for _, r in res.iterrows():
        i = int(np.where(daily.index.values == r["epoch_day"])[0][0])
        xs, ys = d[i - 6 : i + 1], y[i - 6 : i + 1]
        slope = np.polyfit(xs, ys, 1)[0] / 100.0
        assert r["slope_per_day"] == pytest.approx(slope, rel=1e-4, abs=1e-4)
        assert r["revenue"] == pytest.approx(y[i] / 100.0, abs=0.01)


def test_user_entropy_matches_numpy(spark):
    res = _Q["events_user_entropy"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    for _, r in res.iterrows():
        c = ev[ev.user_id == r["user_id"]]["event_type"].value_counts().values
        p = c / c.sum()
        ent = float(-(p * np.log(p)).sum())
        assert r["n_events"] == c.sum()
        assert r["n_types"] == len(c)
        assert r["entropy_nats"] == pytest.approx(ent, abs=1e-5)
    # emitted in descending diversity order
    assert (np.diff(res["entropy_nats"].values) <= 1e-12).all()


def test_ivf_cell_stats_consistency(spark):
    res = _Q["sim_ivf_cell_stats"](spark, SF_DIR).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    sizes = emb.groupby("label").size()
    assert res["n_vectors"].sum() == len(emb)
    for _, r in res.iterrows():
        assert sizes[r["cell"]] == r["n_vectors"]
    assert res["share"].sum() == pytest.approx(1.0, abs=1e-4)
    k, t, mx = len(res), res["n_vectors"].sum(), res["n_vectors"].max()
    assert res["imbalance_factor"].iloc[0] == pytest.approx(mx * k / t, abs=1e-3)
    # cells must cohere: members closer to own centroid than orthogonal
    assert (res["mean_sim_to_centroid"] > 0).all()
