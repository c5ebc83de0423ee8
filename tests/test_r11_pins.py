"""Round-11 pin contracts: the LOF 10-NN pin and the shared PIN_LOCK.

``profile_lof_outliers`` now consumes a session-pinned exact 10-NN list
(VERDICT r10 item 3) instead of rebuilding it through a per-run eager
localCheckpoint. Contract tested here: hit identity, LRU-1 eviction,
k=10 per point, lineage-backed recompute, and — ADVICE r10 — every pin
builder runs its build/evict section under ``engine.PIN_LOCK`` so two
concurrent first calls cannot double-build or evict mid-build.
"""

from __future__ import annotations

import threading

import pyspark.sql.functions as F

from hive_processor_spark import queries
from tests.conftest import SF_DIR, SF_SMALL

_QUERIES = queries()


def test_lof_knn_pin_is_lru1_and_recomputes(spark):
    from hive_processor_spark.operators.similarity import (
        _LOF_KNN_CACHE,
        lof_knn_pinned,
    )

    first = _QUERIES["profile_lof_outliers"](spark, SF_SMALL).collect()
    a = lof_knn_pinned(spark, SF_SMALL)
    assert lof_knn_pinned(spark, SF_SMALL) is a  # hit identity
    # exactly k = 10 neighbors per point
    per_i = a.groupBy("i").count().select(F.collect_set("count")).head()[0]
    assert per_i == [10]
    # switching fixtures evicts down to one entry and unpins the old frame
    lof_knn_pinned(spark, SF_DIR)
    assert len(_LOF_KNN_CACHE) == 1
    assert (spark.sparkContext.applicationId, SF_DIR) in _LOF_KNN_CACHE
    assert not a.storageLevel.useMemory, "evicted 10-NN frame still pinned"
    # lineage-backed: recompute after eviction gives the same answer
    assert _QUERIES["profile_lof_outliers"](spark, SF_SMALL).collect() == first


def test_concurrent_first_calls_build_once(spark):
    """Two threads racing the first pin call must resolve to ONE frame
    (double-checked locking under engine.PIN_LOCK)."""
    from hive_processor_spark.operators.similarity import (
        _LOF_KNN_CACHE,
        lof_knn_pinned,
    )

    _LOF_KNN_CACHE.clear()
    out = []
    threads = [
        threading.Thread(target=lambda: out.append(lof_knn_pinned(spark, SF_SMALL)))
        for _ in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(out) == 4
    assert all(df is out[0] for df in out), "concurrent first calls double-built"
    assert len(_LOF_KNN_CACHE) == 1


def test_every_pin_builder_takes_the_lock():
    """Static guard: each session-pin cache builder must reference
    PIN_LOCK between its cache miss and its cache insert."""
    import inspect

    from hive_processor_spark.operators import dedup, graphs, similarity, textops

    from hive_processor_spark.operators import regression

    builders = [
        similarity.neardup_pairs_pinned,
        similarity.ann_plane_pinned,
        similarity.ann_plane_frame,
        similarity.lof_knn_pinned,
        graphs._knn_edges_pinned,
        textops.bigram_ppl_pinned,
        dedup._neardup_labels_pinned,
        dedup._simhash_pairs_pinned,
        dedup._simhash_classes_pinned,
        dedup._ngram_pairs_pinned,
        dedup._ngram_labels_pinned,
        dedup._ngram_groups_pinned,
        regression.daily_revenue_pinned,
    ]
    for fn in builders:
        src = inspect.getsource(fn)
        assert "PIN_LOCK" in src, f"{fn.__qualname__} builds its pin unguarded"
