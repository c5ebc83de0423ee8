"""Semantic invariants for wave-35 operators (learning curve, modal
alignment audit, phonetic blocking) — independent python/numpy
re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def test_learning_curve_matches_numpy(spark):
    res = _Q["ml_learning_curve"](spark, SF_DIR).toPandas().set_index("n_buckets")
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    x = docs["text"].str.split(" ").str.len().to_numpy().astype(float)
    y = docs["n_chars"].to_numpy().astype(float)
    bkt = ((docs["doc_id"] * 2654435761) % 4294967296 % 10).to_numpy()
    holdout = (docs["doc_id"] % 5 == 4).to_numpy()
    xh, yh = x[holdout], y[holdout]
    prev_rmse = None
    for k in (2, 4, 6, 8, 10):
        m = ~holdout & (bkt < k)
        n = m.sum()
        sx, sy = x[m].sum(), y[m].sum()
        sxx, sxy = (x[m] ** 2).sum(), (x[m] * y[m]).sum()
        b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        a = (sy - b * sx) / n
        sse = np.floor((yh - a - b * xh) ** 2 * 1e4).sum() / 1e4
        rmse = math.sqrt(sse / len(xh))
        row = res.loc[k]
        assert row["n_train"] == n
        assert row["n_test"] == len(xh)
        assert row["slope"] == pytest.approx(b, abs=1e-4)
        assert row["intercept"] == pytest.approx(a, abs=1e-2)
        assert row["holdout_rmse"] == pytest.approx(rmse, abs=1e-3)
        prev_rmse = rmse
    # nested subsets: training size strictly grows
    assert res["n_train"].is_monotonic_increasing
    # strong linear signal: every fit generalizes well
    assert (res["holdout_rmse"] < y.std()).all()


def test_modal_alignment_matches_numpy(spark):
    res = _Q["profile_modal_alignment"](spark, SF_DIR).toPandas().iloc[0]
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    did = set(docs["doc_id"])
    vid = set(emb["vec_id"])
    aligned_ids = did & vid
    assert res["aligned"] == len(aligned_ids)
    assert res["text_only"] == len(did - vid)
    assert res["embedding_only"] == len(vid - did)
    assert res["alignment_rate"] == pytest.approx(
        len(aligned_ids) / len(did | vid), abs=1e-6
    )
    nc = docs.set_index("doc_id")["n_chars"]
    norms = {}
    for r in emb.itertuples():
        v = np.asarray(r.embedding, dtype=np.float64)
        norms[r.vec_id] = math.sqrt(np.floor(v * v * 1e12).sum() / 1e12)
    xs = np.array([nc[i] for i in sorted(aligned_ids)], dtype=float)
    ys = np.array(
        [math.floor(norms[i] * 1e6) for i in sorted(aligned_ids)], dtype=float
    )
    corr = np.corrcoef(xs, ys)[0, 1]
    assert res["corr_chars_norm"] == pytest.approx(corr, abs=1e-4)
    # independent synthetic modalities: no meaningful correlation
    assert abs(res["corr_chars_norm"]) < 0.3


def _soundex_lite(t: str) -> str:
    classes = str.maketrans(
        "bfpvcgjkqsxzdtlmnraeiouyhw", "11112222223345560000000000"
    )
    digits = t[1:].translate(classes)
    digits = re.sub(r"(.)\1+", r"\1", digits)
    digits = digits.replace("0", "")
    return t[0] + (digits + "000")[:3]


def test_phonetic_collisions_matches_python(spark):
    res = _Q["text_phonetic_collisions"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    vocab = {
        t for text in docs["text"] for t in text.split(" ") if len(t) >= 2
    }
    groups: dict[str, list[str]] = {}
    for t in vocab:
        groups.setdefault(_soundex_lite(t), []).append(t)
    multi = {
        c: sorted(ts) for c, ts in groups.items() if len(ts) >= 2
    }
    order = sorted(multi.items(), key=lambda kv: (-len(kv[1]), kv[0]))[:25]
    assert [(r.code, r.n_tokens) for r in res.itertuples()] == [
        (c, len(ts)) for c, ts in order
    ]
    for r in res.itertuples():
        assert r.sample_a == multi[r.code][0]
        assert r.sample_b == multi[r.code][-1]
    # collisions exist and group distinct tokens
    assert (res["n_tokens"] >= 2).all()
    assert (res["sample_a"] != res["sample_b"]).all()
