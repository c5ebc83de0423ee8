"""Shared SQL-expression builders for token n-gram fan-outs.

Every n-gram operator fans a token array out with
``transform(sequence(1, size(w) - k), i -> ...)``. Spark's ``sequence``
is DESCENDING when start > stop — ``sequence(1, 0)`` is ``[1, 0]``, not
empty — so a document with ``size(w) <= k`` tokens fans out invalid
indices: ``element_at(w, 0)`` / ``slice(w, 0, n)`` raise at runtime
(ANSI), and negative ``slice`` starts silently read from the END of the
array. The DuckDB oracles' ``RANGE(1, LEN(w))`` is end-exclusive and
therefore empty for the same inputs, so the correct Spark behavior is
ZERO n-grams. The builders here guard the fan-out accordingly; the
``array()`` else-branch is ``array<void>`` and coerces to whichever
element type the body produces.

The test fixtures carry no short-enough documents to trip this (a crash
would have shown in the gate), so guarded and unguarded plans hash
identically there — the guard is for real corpora, where one-token and
empty documents are routine.
"""

from __future__ import annotations


def guarded_fanout(k: int, body: str, arr: str = "w") -> str:
    """``transform(sequence(1, size(arr) - k), i -> body)`` that yields an
    empty array instead of a descending index sequence when
    ``size(arr) <= k``."""
    return (
        f"CASE WHEN size({arr}) > {k} THEN "
        f"transform(sequence(1, size({arr}) - {k}), i -> {body}) "
        f"ELSE array() END"
    )


def ngram_join(n: int, arr: str = "w", sep: str = " ") -> str:
    """Space-joined n-gram strings (the shingle idiom shared by the text
    and dedup families), guarded for short documents."""
    return guarded_fanout(
        n - 1, f"array_join(slice({arr}, i, {n}), '{sep}')", arr
    )
