"""Physical-plan introspection helpers (SURVEY.md §5.2.5).

The reference has no optimizer to assert against (everything was delegated
to Postgres across the wire, reference ``src/processor.ts:26``); here the
physical plan *is* the performance contract, so tests pin the properties
that matter at 100 TB: filters reaching the Parquet reader, projections
pruning the scan schema, dimension joins broadcasting, aggregates running
partial→final, top-k avoiding global sorts.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output for a DataFrame as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()
