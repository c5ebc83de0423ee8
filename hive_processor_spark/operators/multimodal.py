"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extract runs as Arrow-batched ``mapInPandas``.
The real Spark-side machinery — binary schema, batch iteration, output
contract, partition parallelism — is fully exercised here; only the codec
itself is a stub (the container ships no image/audio libraries), replaced
by a deterministic fake so the query stays oracle-checkable.

At 100 TB: payload bytes dominate row size, so source files should be laid
out with the binary column last (Parquet column pruning skips it for
metadata-only queries), decode batch sizes tuned via
``spark.sql.execution.arrow.maxRecordsPerBatch``, and per-file row groups
kept small enough that one decode batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decoder. A real implementation would
    ``import PIL.Image``/``soundfile`` here and raise
    ``NotImplementedError`` if absent; the fake derives "decoded" metadata
    purely from the payload bytes so the oracle can reproduce it."""
    for pdf in batches:
        payload = pdf["payload"]
        n_bytes = payload.map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "content_md5": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": (64 + n_bytes % 256).astype("int32"),
                "fake_height": (64 + (n_bytes // 7) % 256).astype("int32"),
            }
        )


@register(
    "mm_decode_stub",
    """
    SELECT doc_id,
           CAST(LENGTH(text) AS INT) AS n_bytes,
           MD5(text) AS content_md5,
           CAST(64 + LENGTH(text) % 256 AS INT) AS fake_width,
           CAST(64 + (LENGTH(text) // 7) % 256 AS INT) AS fake_height
    FROM documents
    """,
)
def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode pipeline: utf-8 text bytes stand in for image
    bytes (the fixtures are ASCII, so byte length == char length and the
    byte md5 == the text md5 — which is what makes the oracle exact)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(
        _decode_stub,
        schema=(
            "doc_id bigint, n_bytes int, content_md5 string,"
            " fake_width int, fake_height int"
        ),
    )
