"""Semantic invariants for wave-20 operators (label propagation, per-doc
keyphrases, day-of-week effect, IPv4 subnet rollup) — independent
python/numpy re-implementations on top of the DuckDB hash gate."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from hive_processor_spark import queries
from tests.conftest import SF_DIR

_Q = queries()


def _knn_edges_numpy() -> set[tuple[int, int]]:
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb[emb["vec_id"] < 200].sort_values("vec_id")
    v = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    norms = np.floor(v * v * 1e12).sum(axis=1) / 1e12
    ids = emb["vec_id"].to_numpy()
    edges = set()
    for i in range(len(ids)):
        sims = np.floor(v[i] * v * 1e12).sum(axis=1) / 1e12
        sims = sims / np.sqrt(norms[i] * norms)
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[j], ids[j]),
        )[:3]
        for j in order:
            edges.add((ids[i], ids[j]))
            edges.add((ids[j], ids[i]))
    return edges


def test_label_propagation_matches_python_bsp(spark):
    res = (
        _Q["graph_label_propagation"](spark, SF_DIR)
        .toPandas()
        .set_index("node")
    )
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    emb = emb[emb["vec_id"] < 200].set_index("vec_id")
    edges = _knn_edges_numpy()
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    lbl = {
        n: (int(emb.loc[n, "label"]) if n % 2 == 0 else -1) for n in emb.index
    }
    hist = [dict(lbl)]
    for _ in range(2):
        nxt = dict(hist[-1])
        for n in emb.index:
            if hist[-1][n] >= 0:
                continue
            votes = Counter(
                hist[-1][m] for m in adj.get(n, []) if hist[-1][m] >= 0
            )
            if votes:
                nxt[n] = min(
                    votes, key=lambda c: (-votes[c], c)
                )  # count desc, label asc
        hist.append(nxt)
    for n in emb.index:
        row = res.loc[n]
        assert row["label"] == hist[2][n]
        if hist[0][n] >= 0:
            expect = "seed"
        elif hist[1][n] >= 0:
            expect = "round1"
        elif hist[2][n] >= 0:
            expect = "round2"
        else:
            expect = "unlabeled"
        assert row["origin"] == expect
    # seeds never change
    seeds = res[res["origin"] == "seed"]
    assert (
        seeds["label"].to_numpy()
        == emb.loc[seeds.index, "label"].to_numpy()
    ).all()


def test_keyphrase_matches_python_tfidf_top3(spark):
    res = _Q["text_keyphrase"](spark, SF_DIR).toPandas()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    tfs = {r.doc_id: Counter(t for t in r.text.split(" ") if t) for r in docs.itertuples()}
    df_counts: Counter = Counter()
    for c in tfs.values():
        df_counts.update(c.keys())
    n_docs = len(docs)
    grouped = dict(iter(res.groupby("doc_id")))
    for doc_id, tf in list(tfs.items())[:80]:
        scored = sorted(
            (
                (-math.floor(c * math.log(n_docs / df_counts[t]) * 1e6), t)
                for t, c in tf.items()
            )
        )[:3]
        got = grouped[doc_id].sort_values("rnk")
        assert list(got["term"]) == [t for _, t in scored]
        # engine uses half-up ROUND(.,4); compare unrounded within half-ulp
        assert np.allclose(
            got["tfidf"], [-q / 1e6 for q, _ in scored], atol=5.1e-5
        )
    assert (res.groupby("doc_id")["rnk"].max() <= 3).all()


def test_dow_effect_matches_pandas(spark):
    res = _Q["events_dow_effect"](spark, SF_DIR).toPandas().set_index("dow")
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    daily = ev.groupby(ev["ts"].dt.date).size()
    dows = pd.Series(
        [d.isoweekday() for d in daily.index], index=daily.index
    )
    grand, all_days = daily.sum(), len(daily)
    for dow in sorted(dows.unique()):
        days = daily[dows == dow]
        row = res.loc[dow]
        assert row["n_days"] == len(days)
        assert row["total"] == days.sum()
        assert row["mean_per_day"] == pytest.approx(days.mean(), abs=0.01)
        assert row["lift"] == pytest.approx(
            days.mean() / (grand / all_days), abs=1e-3
        )
        expect = len(days) * grand / all_days
        assert row["z_poisson"] == pytest.approx(
            (days.sum() - expect) / math.sqrt(expect), abs=1e-3
        )
    # lifts are volume-weighted ~1: no weekday can be wildly off in a
    # uniform synthetic stream
    assert res["lift"].between(0.5, 2.0).all()


def test_ipv4_subnets_matches_python(spark):
    res = _Q["fn_ipv4_subnets"](spark, SF_DIR).toPandas()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    ips = (ev["event_id"] * 2654435761) % 4294967296
    o1 = ips // 16777216 % 256
    grp = pd.DataFrame({"o1": o1, "ip": ips, "s16": ips // 65536}).groupby("o1")
    expect = grp.agg(n=("ip", "size"), d16=("s16", "nunique"), m=("ip", "min"))
    got = res.set_index(
        res["subnet"].str.split(".").str[0].astype(int)
    ).sort_index()
    assert list(got.index) == list(expect.index)
    assert (got["n"].to_numpy() == expect["n"].to_numpy()).all()
    assert (
        got["distinct_slash16"].to_numpy() == expect["d16"].to_numpy()
    ).all()
    for o, m in expect["m"].items():
        quad = f"{m // 16777216 % 256}.{m // 65536 % 256}.{m // 256 % 256}.{m % 256}"
        assert got.loc[o, "lowest_ip"] == quad
        assert got.loc[o, "subnet"] == f"{o}.0.0.0/8"
