"""As-of join — the one relational operator Spark lacks natively
(SURVEY.md §4.3; DuckDB has first-class ``ASOF JOIN``).

Implementation is a pure DataFrame composition — union the tagged sides,
then a single window pass per key carries the latest right-side payload
forward onto each left row (``last(..., ignorenulls=True)`` over
``ROWS UNBOUNDED PRECEDING``). No Python execution, no driver loop.

Scale posture: this costs exactly one shuffle on the join keys (the window
partitioning) — the same lower bound a native as-of merge join would pay —
and the sort within each key is Tungsten's. Skewed keys (one user with
millions of events) are the hazard; mitigate upstream by salting the key and
post-merging, or pre-bucketing both inputs on the key column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts: str,
    payload: Sequence[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right.ts <= left.ts`` and equal keys (inclusive as-of, matching
    DuckDB's ``ASOF JOIN ON l.ts >= r.ts``). Left rows with no prior right
    row get NULL payloads (left-outer semantics).

    ``left`` and ``right`` must both contain ``keys`` and ``ts``; ``payload``
    names right-side columns carried over (emitted as ``{prefix}{name}``).

    Tie rule: if several right rows share the same ``(keys, ts)``, the one
    with the greatest payload tuple (column order, NULLs lowest) is carried
    — an arbitrary but deterministic choice an oracle must mirror on tied
    fixtures (DuckDB's ASOF tie choice is unspecified; the shipped fixtures
    have unique ``(key, ts)`` on the right side, verified in tests).
    """
    keys = list(keys)
    payload = list(payload)
    out_payload = [payload_prefix + p for p in payload]

    left_cols = left.columns
    tagged_left = left.select(
        *keys,
        ts,
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
        *[F.lit(None).cast(right.schema[p].dataType).alias(o) for p, o in zip(payload, out_payload)],
    )
    tagged_right = right.select(
        *keys,
        ts,
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left_cols],
        *[F.col(p).alias(o) for p, o in zip(payload, out_payload)],
    )

    # Right rows sort before left rows at equal ts (__side 0 < 1), making the
    # as-of inclusive on ties. Two RIGHT rows tied on (key, ts) would leave
    # the carried payload shuffle-order dependent, so the payload columns
    # themselves complete the ordering: the greatest payload tuple wins —
    # deterministic at any parallelism, and the documented tie rule an
    # oracle must share. (Only right-row order matters here: left rows'
    # payload slots are NULL and `last(ignorenulls)` skips them.)
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col(ts).asc(),
            F.col("__side").asc(),
            *[F.col(o).asc_nulls_first() for o in out_payload],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.last(F.col(o), ignorenulls=True).over(w).alias(f"__f_{o}")
            for o in out_payload
        ],
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[F.col(f"__f_{o}").alias(o) for o in out_payload],
    )
