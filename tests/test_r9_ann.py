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


def test_ann_join_within_clone_pairs_are_one(spark):
    out = _QUERIES["sim_ann_join"](spark, SF_DIR)
    ones = out.filter(F.col("cos_approx") == 1.0)
    # every within-clone pair must appear exactly once and at cos 1.0
    emb = load_table(spark, SF_DIR, "embeddings")
    clones = (
        emb.groupBy("embedding")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .agg(F.sum(F.expr("m * (m - 1) / 2")).alias("p"))
        .head()["p"]
    )
    n_expected = int(clones or 0)
    assert ones.count() >= n_expected
