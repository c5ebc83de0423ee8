"""Round-11 wave property tests (beyond the differential gate).

The gate hash-checks each operator against DuckDB; these tests pin the
SEMANTIC claims the docstrings make: the EXCLUDE CURRENT ROW emulation
is the brute-force leave-one-out answer, the GROUPS-frame emulation
matches a brute-force peer-group sweep, grouping_id bits line up with
the GROUPING flags and strata re-aggregate to the grand total, ORDER BY
ALL yields the left-to-right total order, glob pruning loses nothing,
and winnowing output respects its structural invariants and is
deterministic across runs.
"""

from __future__ import annotations

from collections import defaultdict

from hive_processor_spark import queries
from tests.conftest import SF_SMALL

_QUERIES = queries()


def test_exclude_current_is_brute_force_loo(spark):
    from hive_processor_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    out = {
        r["event_id"]: r
        for r in _QUERIES["win_exclude_current"](spark, SF_SMALL).collect()
    }
    ev = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("user_id") <= 40)
        .select(
            "user_id", "event_id", "ts",
            F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
        )
        .collect()
    )
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append(r)
    checked = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        for i, r in enumerate(rows):
            neigh = [
                rows[j]["cents"]
                for j in range(max(0, i - 3), min(len(rows), i + 4))
                if j != i
            ]
            got = out[r["event_id"]]["loo_avg"]
            if not neigh:
                assert got is None
            else:
                want = round(float(sum(neigh)) / len(neigh) / 100.0, 4)
                assert abs(got - want) < 1e-9, (r["event_id"], got, want)
            checked += 1
    assert checked == len(out) and checked > 0


def test_frame_groups_is_brute_force_peer_sweep(spark):
    rows = _QUERIES["win_frame_groups"](spark, SF_SMALL).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    for grps in by_type.values():
        grps.sort(key=lambda r: r["dollar"])
        for i, r in enumerate(grps):
            lo, hi = max(0, i - 1), min(len(grps), i + 2)
            assert r["frame_rows"] == sum(g["n"] for g in grps[lo:hi])
    assert rows


def test_grouping_id_bits_and_strata(spark):
    rows = _QUERIES["agg_grouping_id"](spark, SF_SMALL).collect()
    for r in rows:
        assert r["gid"] == r["g_status"] * 2 + r["g_priority"]
        assert (r["o_orderstatus"] is None) == (r["g_status"] == 1)
        assert (r["o_orderpriority"] is None) == (r["g_priority"] == 1)
    by_gid = defaultdict(list)
    for r in rows:
        by_gid[r["gid"]].append(r)
    grand = by_gid[3][0]
    for gid in (0, 1, 2):
        assert sum(r["n"] for r in by_gid[gid]) == grand["n"]
        assert abs(sum(r["total"] for r in by_gid[gid]) - grand["total"]) < 0.05


def test_order_by_all_is_total_left_to_right(spark):
    rows = _QUERIES["sql_order_by_all"](spark, SF_SMALL).collect()
    keys = [tuple(r) for r in rows]
    assert keys == sorted(keys)
    assert len({(r[0], r[1]) for r in rows}) == len(rows)


def test_path_glob_prunes_exactly(spark):
    from hive_processor_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    rows = _QUERIES["scan_path_glob"](spark, SF_SMALL).collect()
    langs = {r["lang"] for r in rows}
    assert langs and all(lang.startswith("e") for lang in langs)
    want = {
        r["lang"]: (r["n"], r["c"])
        for r in load_table(spark, SF_SMALL, "documents")
        .filter(F.col("lang").startswith("e"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("c")
        )
        .collect()
    }
    got = {r["lang"]: (r["n_docs"], r["total_chars"]) for r in rows}
    assert got == want


def test_winnowing_invariants_and_determinism(spark):
    a = _QUERIES["dedup_winnowing"](spark, SF_SMALL).collect()
    b = _QUERIES["dedup_winnowing"](spark, SF_SMALL).collect()
    assert a == b, "winnowing output must be deterministic"
    assert 0 < len(a) <= 10
    for r in a:
        assert r["doc_a"] < r["doc_b"]
        assert r["shared"] >= 1
        assert 0.0 < r["overlap"] <= 1.0
    shares = [r["shared"] for r in a]
    assert shares == sorted(shares, reverse=True)


def test_listagg_order_is_balance_desc(spark):
    rows = _QUERIES["agg_listagg_ordered"](spark, SF_SMALL).collect()
    from hive_processor_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    cust = {
        r["c_name"]: r["c_acctbal"]
        for r in load_table(spark, SF_SMALL, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .collect()
    }
    assert rows
    for r in rows:
        names = r["vip_names"].split("|")
        assert len(names) == r["n_vips"]
        bals = [cust[n] for n in names]
        assert bals == sorted(bals, reverse=True)


def test_backward_fill_is_next_valid(spark):
    rows = _QUERIES["win_backward_fill"](spark, SF_SMALL).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    checked_gap = 0
    for seq in by_user.values():
        nxt = None
        for r in reversed(seq):
            if r["v"] is not None:
                nxt = r["v"]
                assert r["filled"] == r["v"]
            else:
                assert r["filled"] == nxt
                checked_gap += 1
    assert checked_gap > 0, "fixture should contain error rows to fill"


def test_sql_variables_resolve_final_assignments(spark):
    # the operator reassigns price_floor/status_wanted via SET VAR; the
    # result must reflect the FINAL values, not the DECLARE defaults
    from hive_processor_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    rows = _QUERIES["sql_variables"](spark, SF_SMALL).collect()
    want = (
        load_table(spark, SF_SMALL, "orders")
        .filter(
            (F.col("o_totalprice") >= 450000.0)
            & (F.col("o_orderstatus") == "O")
        )
        .count()
    )
    assert sum(r["n"] for r in rows) == want and want > 0


def test_udtf_polymorphic_schema_width_tracks_k(spark):
    from pyspark.sql.functions import udtf as _udtf

    from hive_processor_spark.operators.udfs import _TopTokens
    from hive_processor_spark.sources.tables import register_views

    register_views(spark, SF_SMALL)
    spark.udtf.register("top_tokens_t", _udtf(_TopTokens))
    for k in (1, 4):
        df = spark.sql(
            f"SELECT s.* FROM documents d, LATERAL top_tokens_t(d.text, {k}) s"
            " WHERE d.doc_id = 0"
        )
        assert len(df.columns) == 2 * k
        row = df.head()
        assert row[f"cnt0"] >= (row[f"cnt{k-1}"] or 0)
