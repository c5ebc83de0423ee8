"""Short-document robustness (round-7 ADVICE #3, widened repo-wide).

Spark's ``sequence(1, 0)`` is DESCENDING ``[1, 0]``, so every
``transform(sequence(1, size(w) - k), ...)`` n-gram fan-out fed a
document with ``<= k`` tokens used to emit invalid indices —
``element_at(w, 0)`` raises under ANSI and negative ``slice`` starts
silently read from the array END. The sf fixtures carry no such
documents, so only this adversarial fixture exercises the guard
(``functions/textexpr.guarded_fanout``): one-token, empty-text, and
4-token documents must flow through every n-gram operator without a
runtime error, contributing zero n-grams exactly like the DuckDB
oracles' end-exclusive ``RANGE``.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hive_processor_spark import queries

_Q = queries()

# every operator that fans out token n-grams over unfiltered documents
NGRAM_QUERIES = [
    "text_ngrams",
    "text_bigram_lm",
    "text_pmi_bigrams",
    "text_boilerplate_shingles",
    "text_ngram_novelty",
    "text_bigram_perplexity",
    "text_mattr",
    "text_collocation_llr",
    "text_kneser_ney_bigram",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_ngram_verify",
    "dedup_containment",
    "dedup_minhash_sql",
    "dedup_lsh_tuning",
    "text_repetition",
    "text_contamination",
    "pipeline_train_export",
    "pipeline_dsir_weights",
    "text_watermark_greenlist",
    # wave 177: no sequence() fan-out, but empty/1-token docs exercise
    # their per-doc arithmetic (division by n, prefix slice) all the same
    "text_gopher_rules",
    "dedup_prefix_cluster",
    "dedup_keep_best",
    # wave 178: 20-token window fan-out / bigram-scored terciles
    "dedup_substring_spans",
    "pipeline_perplexity_buckets",
]


@pytest.fixture(scope="module")
def short_doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("shortdocs")
    rows = [
        (0, "one", "en", "web", 3),
        (1, "", "en", "web", 0),
        (2, "two words", "en", "books", 9),
        (3, "four tokens right here", "en", "web", 22),
    ]
    # enough ordinary docs that grouped statistics have support
    filler = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the spark engine counts every single bigram carefully"
    )
    for i in range(4, 60):
        rows.append(
            (i, f"{filler} doc {i}", "en", "web" if i % 2 else "books",
             len(filler) + 7)
        )
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(d / "documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", NGRAM_QUERIES)
def test_ngram_query_survives_short_docs(spark, short_doc_dir, name):
    df = _Q[name](spark, short_doc_dir)
    # must execute without an invalid-index runtime error; row counts are
    # query-specific, non-negativity is the only universal contract here
    assert df.count() >= 0
