"""Registry-wide guard: every oracle-backed query emits only scalar columns.

Round 2 shipped two driver FAILs (``fn_array_sets``, ``fn_struct_mutate``)
because the local canonicalizer stringified whole rows while the external
driver's ``sort_values``-based canonicalizer raises ``TypeError: unhashable
type`` on list/dict cells. Two guards close the class:

- ``tools.check.reject_nonscalar`` now refuses list/dict/ndarray cell values
  exactly where the driver would, so the local differential gate can no
  longer pass a query the driver will fail;
- this module asserts, over the *whole registry* at sf0.001, that no Tier-H
  query's output schema contains ArrayType / MapType / StructType columns.
  Tier-R queries (no oracle) are exempt: the driver only counts their rows.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from hive_processor_spark import oracles, queries
from tools.check import reject_nonscalar

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_SMALL", "/root/testdata/sf0.001")

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_reject_nonscalar_red_on_arrays():
    with pytest.raises(TypeError, match="non-scalar"):
        reject_nonscalar(pd.DataFrame({"a": [[1, 2], [3]]}))
    with pytest.raises(TypeError, match="non-scalar"):
        reject_nonscalar(pd.DataFrame({"a": [{"k": 1}, {"k": 2}]}))


def test_reject_nonscalar_green_on_scalars():
    reject_nonscalar(
        pd.DataFrame({"a": [1, 2], "b": ["x", None], "c": [1.5, float("nan")]})
    )


@pytest.mark.slow
def test_every_tier_h_schema_is_scalar(spark):
    """Build (lazily) every oracle-backed query at sf0.001 and check its
    declared schema — the cheap, exhaustive version of the driver's hash
    gate's type constraint."""
    qs, ors = queries(), oracles()
    bad: dict[str, list[str]] = {}
    for name in sorted(ors):
        df = qs[name](spark, SF_SMALL)
        cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
        ]
        if cols:
            bad[name] = cols
    assert not bad, f"Tier-H queries with complex-typed outputs: {bad}"
