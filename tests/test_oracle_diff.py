"""Primary correctness gate: every registered query vs its DuckDB oracle
at sf0.01 — the same differential the driver runs (SURVEY.md §5.2.1)."""

from __future__ import annotations

import pytest

from hive_processor_spark import oracles, queries
from tests.conftest import SF_DIR
from tools.check import compare

_QUERIES = queries()
_ORACLES = oracles()

# r12 (r11 verdict item 2): the full 849-id parametrization is ~half the
# suite's wall time and no longer fits the verification driver's window.
# The 50 driver-sampled head ids stay in the default profile (they mirror
# exactly what the driver checks); the rest carry the `slow` marker and
# run in the builder's close gate (`-m "slow or not slow"`) plus the
# standalone `tools.check` differential (3 configs, all 849).
from hive_processor_spark.engine import _SAMPLE_HEAD

_HEAD = set(_SAMPLE_HEAD)


@pytest.mark.parametrize(
    "name",
    [
        n if n in _HEAD else pytest.param(n, marks=pytest.mark.slow)
        for n in sorted(_QUERIES)
    ],
)
def test_query_matches_oracle(name, spark, duck):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        # Tier R: rows-only — must run and produce a stable, non-degenerate
        # schema; semantic checks live in the dedicated test modules.
        assert sdf.shape[1] >= 1
        return
    odf = duck.execute(_ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems[:5]}"


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_inventory_size():
    # SURVEY §2.2 promises 102 data-plane operators; we ship those plus the
    # training-pipeline extensions. Guard against accidental de-registration.
    assert len(_QUERIES) >= 110
    assert len(_ORACLES) >= 100
