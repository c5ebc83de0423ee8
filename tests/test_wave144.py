"""Semantic invariants for wave-144 (Dunn's post-hoc test)."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_dunn_test_matches_pandas_midranks(spark):
    res = (
        _Q["stats_dunn_test"](spark, SF_DIR)
        .toPandas()
        .set_index(["seg_a", "seg_b"])
    )
    c = pd.read_parquet(
        f"{SF_DIR}/customer.parquet", columns=["c_acctbal", "c_mktsegment"]
    )
    c["rank"] = c.c_acctbal.rank(method="average")
    n = len(c)
    t = c.groupby("c_acctbal").size()
    tie3 = float((t**3 - t).sum())
    var_base = n * (n + 1) / 12.0 - tie3 / (12.0 * (n - 1))
    g = c.groupby("c_mktsegment")["rank"].agg(["size", "mean"])
    segs = sorted(g.index)
    assert len(res) == len(segs) * (len(segs) - 1) // 2
    for sa, sb in itertools.combinations(segs, 2):
        row = res.loc[(sa, sb)]
        za = (g.loc[sa, "mean"] - g.loc[sb, "mean"]) / (
            var_base * (1.0 / g.loc[sa, "size"] + 1.0 / g.loc[sb, "size"])
        ) ** 0.5
        assert row["n_a"] == g.loc[sa, "size"]
        assert row["n_b"] == g.loc[sb, "size"]
        assert row["mean_rank_a"] == pytest.approx(
            g.loc[sa, "mean"], abs=1e-3
        )
        assert row["mean_rank_b"] == pytest.approx(
            g.loc[sb, "mean"], abs=1e-3
        )
        assert row["dunn_z"] == pytest.approx(za, abs=1e-4)
