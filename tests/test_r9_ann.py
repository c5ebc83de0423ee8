"""Round-9 ANN Tier-H promotion tests (sim_ann_join / sim_ann_lsh).

Both operators moved off Spark-only hash families (xxhash64 seeds, MLlib
BucketedRandomProjectionLSH) onto the shared ``_ANN_SIGNS`` literal sign
table so their buckets — hence candidate sets — are value-checkable in
DuckDB. These tests pin (a) the sign-table derivation, (b) the LSH query's
recall against brute force, (c) the join's recall against the exact kernel
(the pre-existing test in test_properties.py covers this; here we pin the
within/cross split instead).
"""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from hive_processor_spark import queries
from hive_processor_spark.operators.similarity import _ANN_SIGNS
from hive_processor_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"
_QUERIES = queries()


def test_sign_table_matches_md5_derivation():
    for t, row in enumerate(_ANN_SIGNS):
        assert len(row) == 64
        for k, v in enumerate(row):
            h = hashlib.md5(f"rproj:{t}:{k}".encode()).hexdigest()
            want = 1.0 if int(h[:8], 16) % 2 == 0 else -1.0
            assert v == want, (t, k)


def test_ann_lsh_top10_recall_vs_bruteforce(spark):
    got = [r.vec_id for r in _QUERIES["sim_ann_lsh"](spark, SF_DIR).collect()]
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    rows = emb.filter(F.col("vec_id") != 0).select("vec_id", "embedding").collect()
    exact = sorted(
        (
            math.sqrt(sum((float(x) - float(y)) ** 2 for x, y in zip(r.embedding, q))),
            r.vec_id,
        )
        for r in rows
    )[:10]
    want = {v for _, v in exact}
    assert len(got) == min(10, len(rows))
    assert len(set(got) & want) / len(want) >= 0.9


def test_f32_prefilter_margin_bound(spark):
    """The bucket kernel's f32 GEMM prefilter keeps pairs with
    approx >= threshold - 1e-3 and recomputes survivors exactly; the
    Tier-H oracle verifies every colliding candidate, so the margin must
    dominate the f32 underestimate (ADVICE r9 item 2). Pin the measured
    all-pairs error at ~100× cushion on the fixture embeddings."""
    import numpy as np

    emb = load_table(spark, SF_DIR, "embeddings").select("embedding").collect()
    mat = np.array([r.embedding for r in emb], dtype=np.float64)
    qn = np.floor(mat * mat * 1e12).astype(np.int64).sum(axis=1) / 1e12
    m32 = mat.astype(np.float32)
    approx = (m32 @ m32.T) / np.sqrt(qn[:, None] * qn[None, :])
    terms_exact = np.einsum("id,jd->ij", mat, mat)  # f64 reference dot
    exact = terms_exact / np.sqrt(qn[:, None] * qn[None, :])
    max_err = float(np.abs(approx - exact).max())
    assert max_err < 1e-4, f"f32 prefilter error {max_err} erodes the 1e-3 margin"


def test_ann_join_within_clone_pairs_are_one(spark):
    out = _QUERIES["sim_ann_join"](spark, SF_DIR)
    # (vec_a, vec_b) must be unique across the WHOLE output — a
    # double-emitted pair (e.g. the dropDuplicates or the emit-once
    # first-band filter regressing) shows up here (ADVICE r9 item 3).
    n_out = out.count()
    n_pairs = out.select("vec_a", "vec_b").distinct().count()
    assert n_out == n_pairs, f"{n_out - n_pairs} duplicate pairs emitted"
    # cos-1.0 rows = every within-clone pair PLUS cross-clone pairs whose
    # exact quantized cosine rounds to 1.0 — count the latter exactly
    # instead of settling for >= (ADVICE r9: double-emits or spurious
    # cross pairs must fail, not pass).
    ones = out.filter(F.col("cos_approx") == 1.0)
    emb = load_table(spark, SF_DIR, "embeddings")
    within_expected = int(
        emb.groupBy("embedding")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .agg(F.sum(F.expr("m * (m - 1) / 2")).alias("p"))
        .head()["p"]
        or 0
    )
    # exact cross-clone cos-1.0 pairs via the brute-force quantized kernel
    from hive_processor_spark.functions.vector import cosine_q

    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("eb"))
    cross_ones = (
        a.join(b, F.col("ia") < F.col("ib"))
        .filter(F.col("ea") != F.col("eb"))
        .filter(F.round(cosine_q(F.col("ea"), F.col("eb")), 4) == 1.0)
        .count()
    )
    assert ones.count() == within_expected + cross_ones
