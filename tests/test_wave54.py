"""Semantic invariants for wave-54 (robust decile spread) — independent
numpy re-implementation on top of the DuckDB hash gate."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_decile_spread_matches_numpy(spark):
    res = _Q["agg_decile_spread"](spark, SF_DIR).toPandas().set_index("segment")
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    for seg, grp in cust.groupby("c_mktsegment"):
        pairs = sorted(
            zip(
                np.floor(grp["c_acctbal"].to_numpy() * 100).astype("int64"),
                grp["c_custkey"].to_numpy(),
            )
        )
        n = len(pairs)

        def pick(q):
            return pairs[math.ceil(q * n) - 1][0]

        p10, p25, p50, p75, p90 = (
            pick(0.10),
            pick(0.25),
            pick(0.50),
            pick(0.75),
            pick(0.90),
        )
        row = res.loc[seg]
        assert row["n"] == n
        assert row["p10"] == pytest.approx(p10 / 100.0, abs=0.01)
        assert row["median"] == pytest.approx(p50 / 100.0, abs=0.01)
        assert row["p90"] == pytest.approx(p90 / 100.0, abs=0.01)
        assert row["interdecile_range"] == pytest.approx(
            (p90 - p10) / 100.0, abs=0.01
        )
        assert row["robust_cv"] == pytest.approx(
            (p90 - p10) / abs(p50), abs=1e-4
        )
        assert row["bowley_skewness"] == pytest.approx(
            (p75 + p25 - 2 * p50) / (p75 - p25), abs=1e-4
        )
        # Bowley skewness is bounded in [-1, 1]
        assert -1.0 <= row["bowley_skewness"] <= 1.0
