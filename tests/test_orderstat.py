"""with_global_order must be bit-identical to the single-partition window
form it replaces, and must leave no corpus-sized global window in the
plan (round-6 window-audit remediation machinery)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from hive_processor_spark.functions.orderstat import with_global_order
from hive_processor_spark.plans import plan_string


def _fixture(spark, n=5000, seed=7):
    # skewed, tied integer values + unique tiebreak + a weight column
    return spark.range(n).select(
        F.col("id"),
        (F.pmod(F.hash(F.col("id") + seed), 97) ** 2).cast("long").alias("v"),
        (F.pmod(F.hash(F.col("id") * 3 + seed), 11) + 1)
        .cast("long")
        .alias("w"),
    )


def _reference(df, desc=False):
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    return df.select(
        "id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cw"
        ),
    )


def test_matches_single_partition_window(spark):
    df = _fixture(spark)
    got = with_global_order(
        df, "v", ["id"], rank="rn", cumsums={"cw": "w"}
    ).select("id", "rn", "cw")
    want = _reference(df)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_matches_desc_order(spark):
    df = _fixture(spark, n=3000, seed=13)
    got = with_global_order(
        df, "v", ["id"], rank="rn", cumsums={"cw": "w"}, desc=True
    ).select("id", "rn", "cw")
    want = _reference(df, desc=True)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_tiny_bucket_count_still_exact(spark):
    # degenerate grids (everything in few buckets) must stay exact
    df = _fixture(spark, n=500, seed=3)
    got = with_global_order(
        df, "v", ["id"], rank="rn", n_buckets=2
    ).select("id", "rn")
    want = _reference(df).select("id", "rn")
    assert got.exceptAll(want).count() == 0


def test_constant_value_single_bucket(spark):
    df = spark.range(100).select("id", F.lit(5).cast("long").alias("v"))
    got = with_global_order(df, "v", ["id"], rank="rn").select("id", "rn")
    w = Window.orderBy("v", "id")
    want = df.select("id", F.row_number().over(w).cast("long").alias("rn"))
    assert got.exceptAll(want).count() == 0


def test_only_global_window_is_bucket_frame(spark):
    """The raw-row windows must be partitioned; the lone global window
    runs over the bucket aggregate (HashAggregate child)."""
    from tools.plan_lint import _window_args_unpartitioned
    import re

    df = _fixture(spark)
    out = with_global_order(df, "v", ["id"], rank="rn", cumsums={"cw": "w"})
    plan = plan_string(out)
    lines = plan.splitlines()
    n_global = 0
    for i, line in enumerate(lines):
        if not re.match(r"\(\d+\) Window", line.strip()):
            continue
        args = next(
            (
                lines[j]
                for j in range(i + 1, min(i + 8, len(lines)))
                if lines[j].startswith("Arguments:")
            ),
            "",
        )
        if _window_args_unpartitioned(args):
            n_global += 1
            # global windows must never carry the per-row rank/cumsum
            assert "row_number" not in args or "_osc" in args
    assert n_global <= 1


def test_lead_value_matches_window(spark):
    df = _fixture(spark, n=2000, seed=21).groupBy("v").count()
    got = with_global_order(
        df, "v", lead_value="nx", n_buckets=16
    ).select("v", "nx")
    w = Window.orderBy("v")
    want = df.select("v", F.lead("v").over(w).alias("nx"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_double_values_exact(spark):
    df = _fixture(spark, n=2000, seed=5).select(
        "id", (F.col("v") / 7.0 + 0.123).alias("v"), "w"
    )
    got = with_global_order(df, "v", ["id"], rank="rn").select("id", "rn")
    w = Window.orderBy("v", "id")
    want = df.select("id", F.row_number().over(w).cast("long").alias("rn"))
    assert got.exceptAll(want).count() == 0


def test_bounds_path_identical_to_span_path(spark):
    """bounds= (round-7: caller-supplied min/max skips the span
    aggregate) must produce IDENTICAL rank/cumsum results to the
    default span-aggregate path — for the exact bounds, a loose
    superset, and under desc."""
    df = _fixture(spark, n=3000, seed=13)
    lo = df.agg(F.min("v")).first()[0]
    hi = df.agg(F.max("v")).first()[0]
    base = with_global_order(
        df, "v", ["id"], rank="rn", cumsums={"cw": "w"}
    ).select("id", "rn", "cw")
    for bounds in [(lo, hi), (lo - 100, hi + 1000), (hi, lo)]:
        got = with_global_order(
            df, "v", ["id"], rank="rn", cumsums={"cw": "w"}, bounds=bounds
        ).select("id", "rn", "cw")
        assert got.exceptAll(base).count() == 0, bounds
        assert base.exceptAll(got).count() == 0, bounds
    base_d = with_global_order(df, "v", ["id"], rank="rn", desc=True).select(
        "id", "rn"
    )
    got_d = with_global_order(
        df, "v", ["id"], rank="rn", desc=True, bounds=(lo, hi)
    ).select("id", "rn")
    assert got_d.exceptAll(base_d).count() == 0
    assert base_d.exceptAll(got_d).count() == 0


def test_bounds_path_skips_span_aggregate(spark):
    """With bounds supplied the plan must contain NO aggregate over the
    input ahead of the bucket stats (the span min/max pass is gone) —
    counted as one fewer HashAggregate pair than the default path."""
    from hive_processor_spark.plans import plan_string

    df = _fixture(spark, n=500, seed=3)
    p_span = plan_string(with_global_order(df, "v", rank="rn"))
    p_bounds = plan_string(
        with_global_order(df, "v", rank="rn", bounds=(0, 10000))
    )
    assert p_bounds.count("HashAggregate") < p_span.count("HashAggregate")


def _reference_r9(df, desc=False):
    """Single-partition references for the round-9 additions: tie-max rank
    (rank_ceil), peer count (tie_count), global-order lead of a column
    (lead_cols)."""
    order = [F.col("v").desc() if desc else F.col("v").asc(), F.col("id")]
    w = Window.orderBy(*order)
    wv = Window.orderBy(F.col("v").desc() if desc else F.col("v").asc())
    return df.select(
        "id",
        F.count(F.lit(1))
        .over(wv.rangeBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("rc"),
        F.count(F.lit(1)).over(Window.partitionBy("v")).cast("long").alias("tc"),
        F.lead("w").over(w).alias("wn"),
    )


def test_rank_ceil_tie_count_lead_cols_match_reference(spark):
    df = _fixture(spark)
    got = with_global_order(
        df,
        "v",
        ["id"],
        rank_ceil="rc",
        tie_count="tc",
        lead_cols={"wn": "w"},
    ).select("id", "rc", "tc", "wn")
    want = _reference_r9(df)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_rank_ceil_lead_cols_desc(spark):
    df = _fixture(spark, n=3000, seed=29)
    got = with_global_order(
        df,
        "v",
        ["id"],
        rank_ceil="rc",
        tie_count="tc",
        lead_cols={"wn": "w"},
        desc=True,
    ).select("id", "rc", "tc", "wn")
    want = _reference_r9(df, desc=True)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_lead_cols_with_bounds_and_spread(spark):
    # superset bounds + the spread repartition must not change results
    df = _fixture(spark, n=2000, seed=41)
    got = with_global_order(
        df,
        "v",
        ["id"],
        rank_ceil="rc",
        lead_cols={"wn": "w"},
        bounds=(-1.0, 10000.0),
        spread=True,
    ).select("id", "rc", "wn")
    want = _reference_r9(df).select("id", "rc", "wn")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_grouped_order_statistics_matches_window_form(spark):
    from hive_processor_spark.functions.orderstat import (
        grouped_order_statistics,
    )

    # heavily tied histogram across 3 uneven groups
    rows = spark.range(9000).select(
        (F.pmod(F.col("id"), 3)).cast("string").alias("g"),
        (F.pmod(F.hash(F.col("id") + 5), 211) ** 2 % 5000).cast("long").alias("x"),
    )
    hist = rows.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    got = grouped_order_statistics(
        hist,
        "g",
        "x",
        "c",
        {
            "q1": lambda n: F.ceil(0.25 * n),
            "med": lambda n: F.ceil(0.50 * n),
            "q3": lambda n: F.ceil(0.75 * n),
            "p99": lambda n: F.ceil(0.99 * n),
        },
    ).select("g", "n", "q1", "med", "q3", "p99")
    w = Window.partitionBy("g").orderBy("x")
    ranked = rows.select(
        "g", "x", F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("n"),
    )
    want = ranked.groupBy("g").agg(
        F.max("n").cast("long").alias("n"),
        *[
            F.max(
                F.when(
                    F.col("rn") == F.ceil(q * F.col("n")).cast("long"), F.col("x")
                )
            ).alias(nm)
            for nm, q in [("q1", 0.25), ("med", 0.50), ("q3", 0.75), ("p99", 0.99)]
        ],
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_grouped_order_statistics_single_group_and_extremes(spark):
    from hive_processor_spark.functions.orderstat import (
        grouped_order_statistics,
    )

    rows = spark.range(1, 1001).select(
        F.lit("all").alias("g"), F.col("id").cast("long").alias("x")
    )
    hist = rows.groupBy("g", "x").agg(F.count(F.lit(1)).alias("c"))
    got = grouped_order_statistics(
        hist,
        "g",
        "x",
        "c",
        {"mn": lambda n: F.lit(1), "mx": lambda n: n, "mid": lambda n: n / 2},
    ).head()
    assert got["n"] == 1000 and got["mn"] == 1 and got["mx"] == 1000
    assert got["mid"] == 500
