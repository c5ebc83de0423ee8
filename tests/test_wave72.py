"""Semantic invariants for wave-72 operators (Erlang C, POT/GPD tail,
dedup cluster purity) — independent python re-derivations."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_erlang_c_matches_python(spark):
    res = _Q["ops_erlang_c"](spark, SF_DIR).toPandas().set_index("n_agents")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    peak = int(ev.groupby(ev["ts"].dt.floor("h")).size().max())
    a = peak * 300.0 / 3600.0
    n0 = math.ceil(a)
    for k in range(8):
        n = n0 + k
        terms = [
            math.floor(math.exp(j * math.log(a) - math.lgamma(j + 1)) * 1e9)
            / 1e9
            for j in range(n + 1)
        ]
        b = terms[n] / sum(terms)
        c = n * b / (n - a * (1 - b))
        row = res.loc[n]
        assert row["peak_hourly_arrivals"] == peak
        assert row["offered_erlangs"] == pytest.approx(round(a, 4))
        assert row["occupancy"] == pytest.approx(round(a / n, 6))
        assert row["p_wait"] == pytest.approx(c, abs=1e-5)
        assert row["asa_seconds"] == pytest.approx(
            c * 300.0 / (n - a), abs=0.02
        )
        assert row["service_level_20s"] == pytest.approx(
            1 - c * math.exp(-(n - a) * 20.0 / 300.0), abs=1e-5
        )
    # more agents -> less queueing, monotonically
    assert res["p_wait"].is_monotonic_decreasing
    assert res["service_level_20s"].is_monotonic_increasing


def test_pot_gpd_matches_numpy(spark):
    res = _Q["ts_pot_gpd"](spark, SF_DIR).toPandas().iloc[0]
    orders = pd.read_parquet(f"{SF_DIR}/orders.parquet")
    cents = np.floor(orders["o_totalprice"].to_numpy() * 100.0).astype("int64")
    daily = (
        pd.DataFrame({"d": orders["o_orderdate"].dt.date, "c": cents})
        .groupby("d")["c"]
        .sum()
        .to_numpy(float)
    )
    u = float(np.quantile(daily, 0.90))
    y = (daily[daily > u] - u) / 100.0
    k = len(y)
    m = np.floor(y * 100).astype("int64").sum() / 100 / k
    sy = np.floor(y * 100).astype("int64").sum() / 100
    syy = np.floor(y * y * 100).astype("int64").sum() / 100
    v = (syy - sy * sy / k) / (k - 1)
    xi = 0.5 * (1 - m * m / v)
    beta = 0.5 * m * (1 + m * m / v)
    assert res["n_exceedances"] == k
    assert res["threshold"] == pytest.approx(round(u / 100, 2), abs=0.02)
    assert res["mean_excess"] == pytest.approx(round(m, 4), abs=1e-3)
    assert res["gpd_xi"] == pytest.approx(xi, abs=1e-5)
    assert res["gpd_beta"] == pytest.approx(beta, abs=1e-3)
    rl = u / 100 + beta / xi * ((100.0 * k / len(daily)) ** xi - 1)
    assert res["return_level_100d"] == pytest.approx(rl, abs=0.05)
    # the extrapolated 100-day level must sit above the threshold
    assert res["return_level_100d"] > res["threshold"]


def test_cluster_purity_matches_python(spark):
    res = _Q["dedup_cluster_purity"](spark, SF_DIR).toPandas().iloc[0]
    from hive_processor_spark.operators.dedup import _simhash_sigs
    from hive_processor_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sig = _simhash_sigs(docs).toPandas()
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")[
        ["vec_id", "label"]
    ].rename(columns={"vec_id": "doc_id"})
    twins = sig.groupby("simhash").filter(lambda g: len(g) >= 2)
    members = twins.merge(emb, on="doc_id")
    sizes, tops = [], []
    for _, g in members.groupby("simhash"):
        sizes.append(len(g))
        tops.append(int(g["label"].value_counts().iloc[0]))
    assert res["n_clusters"] == len(sizes)
    assert res["n_docs_clustered"] == sum(sizes)
    assert res["n_majority_label"] == sum(tops)
    assert res["weighted_purity"] == pytest.approx(
        round(sum(tops) / sum(sizes), 6)
    )
    assert res["n_pure_clusters"] == sum(
        1 for s, t in zip(sizes, tops) if s == t
    )
    assert res["largest_cluster"] == max(sizes)
    assert 0.0 < res["weighted_purity"] <= 1.0
