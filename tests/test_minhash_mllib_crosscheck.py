"""MLlib cross-check for the round-9 ``dedup_minhash`` rewrite (VERDICT r8
item 2).

Through round 8 ``dedup_minhash`` ran on ``pyspark.ml.feature.MinHashLSH``
(``approxSimilarityJoin``) — correct but 5.5 s at sf0.1 (model fit + UDF
join) and Tier-R, because MLlib's seeded hash family is not mirrorable in
the DuckDB oracle. Round 9 re-expressed it on the integer signature
machinery shared with ``dedup_minhash_sql`` (same ``_MH_PERMS`` seeds,
4x2 banding, exact verify), promoting it to Tier-H. Per the verdict, the
MLlib formulation survives HERE as an independent-implementation
cross-check: two unrelated hash families must agree on the verified pair
set at fixture scale.

Checks (sf0.001):

1. The integer path's output is EXACTLY the exact-jaccard truth set
   (``dedup_ngram_jaccard`` >= 0.08) — verification makes precision 1.0
   structural; recall 1.0 is a fixture measurement the banding must keep.
2. Every truth pair the MLlib candidate generator reaches is also emitted
   by the integer path — the two families' recall agrees.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hive_processor_spark import queries
from hive_processor_spark.operators.dedup import ngram_join

SF_DIR = "/root/testdata/sf0.001"
_QUERIES = queries()


def _truth_pairs(spark):
    return {
        (r.doc_a, r.doc_b)
        for r in _QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }


def test_integer_path_equals_exact_truth(spark):
    got = {
        (r.doc_a, r.doc_b) for r in _QUERIES["dedup_minhash"](spark, SF_DIR).collect()
    }
    truth = _truth_pairs(spark)
    assert truth, "fixture must contain near-dup pairs"
    assert got == truth


def test_mllib_candidates_agree_with_integer_path(spark):
    try:
        from pyspark.ml.feature import HashingTF, MinHashLSH
    except ImportError:  # pragma: no cover - ml ships with pyspark
        pytest.skip("pyspark.ml unavailable")

    from hive_processor_spark.sources.tables import load_table

    raw = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    shingles = F.expr("array_distinct(" + ngram_join(3) + ")")
    reps = (
        raw.groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("rep_id"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
            F.min_by("text", "doc_id").alias("text"),
        )
        .select("rep_id", "members", F.split("text", " ").alias("w"))
        .select("rep_id", "members", shingles.alias("tokens"))
        .filter(F.size("tokens") > 0)
        .localCheckpoint()
    )
    tf = HashingTF(inputCol="tokens", outputCol="vec", numFeatures=1 << 16, binary=True)
    vecs = tf.transform(reps)
    model = MinHashLSH(
        inputCol="vec", outputCol="hashes", numHashTables=8, seed=42
    ).fit(vecs)
    cand = model.approxSimilarityJoin(vecs, vecs, 0.93, distCol="d").filter(
        F.col("datasetA.rep_id") < F.col("datasetB.rep_id")
    )
    ml_pairs = set()
    for row in cand.select(
        F.col("datasetA.members").alias("ma"), F.col("datasetB.members").alias("mb")
    ).collect():
        for x in row.ma:
            for y in row.mb:
                ml_pairs.add((min(x, y), max(x, y)))
    # within-clone pairs: identical shingle sets collide in every table
    for row in reps.filter(F.size("members") >= 2).select("members").collect():
        m = row.members
        for i in range(len(m)):
            for j in range(i + 1, len(m)):
                ml_pairs.add((m[i], m[j]))

    truth = _truth_pairs(spark)
    integer_path = {
        (r.doc_a, r.doc_b) for r in _QUERIES["dedup_minhash"](spark, SF_DIR).collect()
    }
    # every true pair MLlib's family reaches, the integer family reaches too
    assert (ml_pairs & truth) <= integer_path
