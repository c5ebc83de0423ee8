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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


def _image_codec():
    """Optional real image codec: PIL if importable, else None (this
    container ships no image libraries — the deterministic fallback below
    keeps the pipeline oracle-checkable either way)."""
    try:  # pragma: no cover - PIL absent in the test container
        from PIL import Image

        return Image
    except ImportError:
        return None


def _audio_codec():
    """Optional real audio codec: soundfile if importable, else None."""
    try:  # pragma: no cover - soundfile absent in the test container
        import soundfile

        return soundfile
    except ImportError:
        return None


def _image_dims(payload: bytes) -> tuple[int, int] | None:
    """Real (width, height) when PIL is importable AND the payload is a
    decodable image; None otherwise. Import is resolved per executor
    process (cheap — cached by Python), so the same code runs with or
    without the library installed."""
    image_mod = _image_codec()
    if image_mod is None:
        return None
    import io

    try:  # pragma: no cover - real codec path needs PIL + image payloads
        with image_mod.open(io.BytesIO(payload)) as img:
            return int(img.width), int(img.height)
    except Exception:
        return None


def _decode_stub(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Image decode kernel: try the real codec per payload, fall back to
    deterministic byte-derived metadata. On the shipped fixtures (utf-8
    text bytes, never a valid image) every row takes the fallback, so the
    oracle rows are identical whether or not PIL is installed; pointed at
    real image payloads with PIL present, the same query returns true
    decoded dimensions."""
    has_codec = _image_codec() is not None
    for pdf in batches:
        payload = pdf["payload"]
        n_bytes = payload.map(len)
        fake_w = (64 + n_bytes % 256).astype("int32")
        fake_h = (64 + (n_bytes // 7) % 256).astype("int32")
        if has_codec:  # pragma: no cover - PIL absent in the test container
            real = payload.map(_image_dims)
            fake_w = (
                real.map(lambda d: d[0] if d else None)
                .combine_first(fake_w)
                .astype("int32")
            )
            fake_h = (
                real.map(lambda d: d[1] if d else None)
                .combine_first(fake_h)
                .astype("int32")
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "content_md5": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                "fake_width": fake_w,
                "fake_height": fake_h,
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


@register(
    "mm_resize_stub",
    """
    SELECT doc_id,
           CAST(64 + LENGTH(text) % 256 AS INT) AS src_w,
           CAST(64 + (LENGTH(text) // 7) % 256 AS INT) AS src_h,
           CAST(224 AS INT) AS dst_w,
           CAST(FLOOR((64 + (LENGTH(text) // 7) % 256) * 224.0
                      / (64 + LENGTH(text) % 256)) AS INT) AS dst_h
    FROM documents
    """,
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning stage: aspect-preserving target dims for each decoded
    image (width pinned to 224). The arithmetic is the real operator; the
    pixel resample itself would live in the same mapInPandas as the decoder
    (one Arrow pass for decode→resize→re-encode, not three)."""
    decoded = mm_decode_stub(spark, sf_dir)
    return decoded.select(
        "doc_id",
        F.col("fake_width").alias("src_w"),
        F.col("fake_height").alias("src_h"),
        F.lit(224).cast("int").alias("dst_w"),
        F.floor(F.col("fake_height") * 224.0 / F.col("fake_width"))
        .cast("int")
        .alias("dst_h"),
    )


def _audio_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio metadata kernel: soundfile when importable and decodable,
    else deterministic PCM-style metadata from the byte length (16-bit
    mono at a byte-derived sample rate) — same fallback contract as the
    image decoder."""
    sf_mod = _audio_codec()
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        n_samples = (n_bytes // 2).astype("int64")
        rate = (8000 + (n_bytes % 4) * 8000).astype("int32")
        if sf_mod is not None:  # pragma: no cover - soundfile absent here
            import io

            def _real(b):
                try:
                    info = sf_mod.info(io.BytesIO(b))
                    return int(info.frames), int(info.samplerate)
                except Exception:
                    return None

            real = pdf["payload"].map(_real)
            n_samples = (
                real.map(lambda r: r[0] if r else None)
                .combine_first(n_samples)
                .astype("int64")
            )
            rate = (
                real.map(lambda r: r[1] if r else None)
                .combine_first(rate)
                .astype("int32")
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_samples": n_samples,
                "sample_rate": rate,
                "duration_ms": (n_samples * 1000 // rate).astype("int64"),
            }
        )


@register(
    "mm_audio_meta",
    """
    SELECT doc_id,
           CAST(LENGTH(text) // 2 AS BIGINT) AS n_samples,
           CAST(8000 + (LENGTH(text) % 4) * 8000 AS INT) AS sample_rate,
           CAST((LENGTH(text) // 2) * 1000 // (8000 + (LENGTH(text) % 4) * 8000)
                AS BIGINT) AS duration_ms
    FROM documents
    """,
)
def mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-payload metadata extraction through the same Arrow-batched
    binary-column pipeline as the image decoder: real ``soundfile`` probe
    when the library is present and the payload is decodable audio,
    deterministic byte-derived PCM metadata otherwise (always, on these
    text-byte fixtures — which keeps the oracle exact)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(
        _audio_meta,
        schema="doc_id bigint, n_samples bigint, sample_rate int, duration_ms bigint",
    )


def _frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Fake frame sampler: every 50th "frame" of a payload whose frame count
    is derived from its byte length (1 frame per 16 bytes). One input row
    fans out to n rows — the shape of real video frame extraction."""
    for pdf in batches:
        out_doc, out_idx, out_off = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // 16
            for idx in range(0, n_frames, 50):
                out_doc.append(doc_id)
                out_idx.append(idx)
                out_off.append(idx * 16)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "byte_offset": pd.Series(out_off, dtype="int64"),
            }
        )


@register(
    "mm_frame_sample",
    """
    SELECT doc_id,
           CAST(UNNEST(RANGE(0, LENGTH(text) // 16, 50)) AS INT) AS frame_idx,
           CAST(UNNEST(RANGE(0, LENGTH(text) // 16, 50)) * 16 AS BIGINT) AS byte_offset
    FROM documents
    WHERE LENGTH(text) >= 16
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: 1 payload row → n frame rows through the
    same Arrow-batched kernel a real demuxer would use (payload bytes stand
    in for the container; frame count derives deterministically from byte
    length so the oracle is exact)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return docs.mapInPandas(
        _frame_sample, schema="doc_id bigint, frame_idx int, byte_offset bigint"
    )


@register(
    "mm_shard_manifest",
    """
    WITH sized AS (
        SELECT doc_id, OCTET_LENGTH(ENCODE(text)) AS n_bytes,
               MD5(CAST(doc_id AS VARCHAR)) AS hk
        FROM documents
    ), placed AS (
        SELECT doc_id, n_bytes,
               SUM(n_bytes) OVER (ORDER BY hk, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_bytes AS start_off
        FROM sized
    ), sharded AS (
        SELECT doc_id, n_bytes, start_off,
               CAST(FLOOR(CAST(start_off AS DOUBLE) / 4096.0) AS BIGINT) AS shard
        FROM placed
    )
    SELECT shard, doc_id,
           CAST(start_off - MIN(start_off) OVER (PARTITION BY shard) AS BIGINT)
               AS offset_in_shard,
           CAST(n_bytes AS BIGINT) AS n_bytes
    FROM sharded
    ORDER BY shard, offset_in_shard, doc_id
    """,
)
def mm_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset-style shard manifest for binary training payloads: lay
    documents out in deterministic hash order, cut ~4 KiB shards by byte
    offset, and emit each sample's (shard, offset, length) — the index a
    dataloader seeks with, built before any bytes move.

    Byte sizes come straight off the payload column (OCTET_LENGTH — the
    Parquet-pruned metadata path; the blob itself is never read). The
    global prefix sum is the explicit two-pass bucketed two-level
    cumulative of ``functions/orderstat.py`` (round-6 window-audit fix —
    same as ``pipeline_shard_balance``; an unpartitioned running window
    would move every row through one task); everything is integer
    arithmetic, so shard cuts and offsets are bit-stable at any
    parallelism."""
    from hive_processor_spark.functions.orderstat import with_global_order

    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    hk = F.md5(F.col("doc_id").cast("string"))
    sized = docs.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_bytes"),
        hk.alias("hk"),
        F.conv(F.substring(hk, 1, 15), 16, 10).cast("long").alias("kn"),
    )
    placed = with_global_order(
        sized, "kn", ["hk", "doc_id"], cumsums={"cs": "n_bytes"}
    ).select(
        "doc_id",
        "n_bytes",
        (F.col("cs") - F.col("n_bytes")).alias("start_off"),
    )
    sharded = placed.select(
        "doc_id",
        "n_bytes",
        "start_off",
        F.floor(F.col("start_off").cast("double") / 4096.0)
        .cast("long")
        .alias("shard"),
    )
    ws = Window.partitionBy("shard")
    return sharded.select(
        "shard",
        "doc_id",
        (F.col("start_off") - F.min("start_off").over(ws))
        .cast("long")
        .alias("offset_in_shard"),
        F.col("n_bytes").cast("long"),
    ).orderBy("shard", "offset_in_shard", "doc_id")


_PHASH_BANDS = 8
_PHASH_BAND_BITS = 8
_PHASH_MAX_HAMMING = _PHASH_BANDS - 1  # pigeonhole-exact banding bound

_PHASH_BAND_COLS = ",\n               ".join(
    f"CAST(list_sum([CASE WHEN 64*px[i+{b * _PHASH_BAND_BITS + 1}] > total"
    f" THEN (1::BIGINT<<i) ELSE 0 END FOR i IN RANGE(0,{_PHASH_BAND_BITS})])"
    f" AS BIGINT) AS b{b}"
    for b in range(_PHASH_BANDS)
)
_PHASH_HAMMING = " + ".join(
    f"bit_count(xor(a.b{b}, b.b{b}))" for b in range(_PHASH_BANDS)
)


@register(
    "mm_phash_neardup",
    f"""
    WITH s AS (
        SELECT doc_id,
               [ascii(substr(text, 1 + (i * length(text)) // 64, 1))
                FOR i IN RANGE(0, 64)] AS px
        FROM documents
    ), t AS (
        SELECT doc_id, px, CAST(list_sum(px) AS BIGINT) AS total FROM s
    ), sig AS (
        SELECT doc_id,
               {_PHASH_BAND_COLS}
        FROM t
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST({_PHASH_HAMMING} AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE {_PHASH_HAMMING} <= {_PHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b
    """,
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for binary payloads — the
    image-dedup stage of a multimodal training pipeline. A 64-bit
    average-hash is computed from 64 evenly-sampled payload bytes
    (utf-8 text bytes stand in for decoded luminance, per the family's
    deterministic-codec discipline; a real pipeline runs the DCT inside
    the same Arrow decode pass as ``mm_decode_stub``): bit i is
    "sample i above the payload mean", compared in exact integer form
    ``64*px > total`` so no engine ever divides. Retrieval is LSH-banded
    exactly like ``dedup_simhash_pairs``: 8 bands x 8 bits; Hamming <= 7
    implies at least one band matches (pigeonhole), so the banded join
    provably returns the same pairs as the O(n^2) oracle while touching
    only colliding buckets at corpus scale. Emit-once first-matching-band
    filter keeps the join's shuffle the only exchange.

    The signature frame is persisted before the self-join: without the
    materialization boundary Catalyst's project-collapse inlines the
    64-sample ``px``/``total`` HOF chain into every per-bit lambda on both
    join sides (an O(64x64) interpreted re-evaluation per row, measured
    30 s vs 1 s at 500 docs). ``persist`` (not ``localCheckpoint``) keeps
    lineage, so a lost executor recomputes instead of failing the job."""
    from pyspark.storagelevel import StorageLevel

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = (
        docs.select(
            "doc_id",
            F.expr(
                "transform(sequence(0, 63), i -> ascii(substring("
                "text, 1 + CAST((i * length(text)) DIV 64 AS INT), 1)))"
            ).alias("px"),
        )
        .select(
            "doc_id",
            "px",
            F.expr("aggregate(px, 0L, (acc, x) -> acc + x)").alias("total"),
        )
        .select(
            "doc_id",
            # the whole 64-bit hash PACKED into one BIGINT (band j at
            # bits 8j..8j+7): every downstream per-pair expression —
            # band extraction, first-band tie-break, Hamming — becomes
            # shift/mask/bit_count codegen instead of interpreted
            # array-HOF lambdas (measured 17.5 s → ~2 s at sf0.1 on the
            # ~400k bucket-collision candidates)
            F.expr(
                f"aggregate(sequence(0, {_PHASH_BANDS * _PHASH_BAND_BITS - 1}),"
                " 0L, (acc, i) -> acc + IF("
                "64 * element_at(px, CAST(i + 1 AS INT)) > total,"
                " shiftleft(1L, i), 0L))"
            ).alias("phash"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    band_of = lambda col, j: (  # noqa: E731
        F.shiftright(col, j * _PHASH_BAND_BITS).bitwiseAND(F.lit(255))
    )
    buckets = sig.select(
        "doc_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(_PHASH_BANDS - 1))).alias("band"),
    ).select(
        "doc_id",
        "phash",
        "band",
        F.expr(f"shiftright(phash, band * {_PHASH_BAND_BITS}) & 255").alias(
            "bval"
        ),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    first_band = F.lit(_PHASH_BANDS - 1)
    for j in range(_PHASH_BANDS - 2, -1, -1):
        first_band = F.when(
            band_of(F.col("a.phash"), j) == band_of(F.col("b.phash"), j),
            F.lit(j),
        ).otherwise(first_band)
    hamming = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(F.col("a.band") == first_band)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
        .orderBy("doc_a", "doc_b")
    )


@register(
    "mm_scene_cuts",
    """
    WITH vids AS (
        SELECT doc_id AS video_id,
               CAST(8 + doc_id % 9 AS INT) AS n_frames
        FROM documents WHERE doc_id < 40
    ), frames AS (
        SELECT video_id, f.i AS frame_idx,
               CAST((video_id * 1000003 + f.i * 2654435761) % 4294967296
                    AS BIGINT) AS fhash
        FROM vids, LATERAL (
            SELECT UNNEST(RANGE(0, n_frames)) AS i
        ) f
    ), deltas AS (
        SELECT video_id, frame_idx,
               BIT_COUNT(XOR(fhash,
                   LAG(fhash) OVER (PARTITION BY video_id
                                    ORDER BY frame_idx))) AS hamming
        FROM frames
    )
    SELECT video_id,
           CAST(COUNT(*) FILTER (WHERE hamming IS NOT NULL) AS BIGINT)
               AS n_transitions,
           CAST(COUNT(*) FILTER (WHERE hamming >= 18) AS BIGINT) AS n_cuts,
           CAST(MAX(hamming) AS INT) AS max_hamming,
           ROUND(CAST(SUM(hamming) AS DOUBLE)
                 / COUNT(*) FILTER (WHERE hamming IS NOT NULL), 4)
               AS mean_hamming
    FROM deltas GROUP BY 1 ORDER BY video_id
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over sampled video frames: per video, a
    32-bit perceptual hash per sampled frame (deterministic synthetic
    derivation here — the real pipeline plugs the pHash of the decoded
    frame into the same column), consecutive-frame Hamming distance via
    ``bit_count(xor(...))``, and a cut wherever the distance clears the
    threshold — the shot-boundary primitive for video curation. The
    frame fan-out is a bounded per-video explode (frame_idx sequence),
    the lag runs inside the video partition, and every comparison is
    exact integer bit math — hash-stable anywhere. At 100 TB the only
    change is that fhash comes from a Pandas-UDF decode over the binary
    payload column (the mm_decode/mm_phash machinery in this module);
    the plan — explode, partitioned lag, grouped rollup — is identical."""
    docs = load_table(spark, sf_dir, "documents")
    vids = docs.filter(F.col("doc_id") < 40).select(
        F.col("doc_id").alias("video_id"),
        (8 + F.col("doc_id") % 9).cast("int").alias("n_frames"),
    )
    frames = vids.select(
        "video_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1)
        ).alias("frame_idx"),
    ).select(
        "video_id",
        "frame_idx",
        (
            (
                F.col("video_id") * 1000003
                + F.col("frame_idx") * F.lit(2654435761)
            )
            % F.lit(4294967296)
        )
        .cast("bigint")
        .alias("fhash"),
    )
    w = Window.partitionBy("video_id").orderBy("frame_idx")
    deltas = frames.select(
        "video_id",
        "frame_idx",
        F.bit_count(
            F.col("fhash").bitwiseXOR(F.lag("fhash").over(w))
        ).alias("hamming"),
    )
    return (
        deltas.groupBy("video_id")
        .agg(
            F.count("hamming").cast("bigint").alias("n_transitions"),
            F.count_if(F.col("hamming") >= 18).cast("bigint").alias("n_cuts"),
            F.max("hamming").cast("int").alias("max_hamming"),
            F.round(
                F.sum("hamming").cast("double") / F.count("hamming"), 4
            ).alias("mean_hamming"),
        )
        .orderBy("video_id")
    )


@register(
    "mm_audio_vad",
    """
    WITH clips AS (
        SELECT doc_id AS clip_id, CAST(40 + doc_id % 21 AS INT) AS n_frames
        FROM documents WHERE doc_id BETWEEN 100 AND 129
    ), frames AS (
        SELECT clip_id, f.i AS frame_idx,
               CAST((clip_id * 48271 + f.i * 2654435761) % 4294967296 % 1000
                    AS BIGINT) AS energy
        FROM clips, LATERAL (SELECT UNNEST(RANGE(0, n_frames)) AS i) f
    ), flagged AS (
        SELECT clip_id, frame_idx,
               CAST(energy >= 500 AS INT) AS speech
        FROM frames
    ), islands AS (
        SELECT clip_id, frame_idx, speech,
               frame_idx - ROW_NUMBER() OVER (
                   PARTITION BY clip_id, speech ORDER BY frame_idx) AS grp
        FROM flagged
    ), segs AS (
        SELECT clip_id, grp, CAST(COUNT(*) AS BIGINT) AS seg_len
        FROM islands WHERE speech = 1 GROUP BY 1, 2
    ), per_clip AS (
        SELECT f.clip_id,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(SUM(f.speech) AS BIGINT) AS speech_frames
        FROM flagged f GROUP BY 1
    )
    SELECT p.clip_id, p.n_frames, p.speech_frames,
           ROUND(CAST(p.speech_frames AS DOUBLE) / p.n_frames, 4)
               AS speech_ratio,
           CAST(COALESCE(COUNT(s.grp), 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(MAX(s.seg_len), 0) AS BIGINT) AS longest_segment
    FROM per_clip p LEFT JOIN segs s ON s.clip_id = p.clip_id
    GROUP BY p.clip_id, p.n_frames, p.speech_frames
    ORDER BY p.clip_id
    """,
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over audio frame energies: threshold
    each frame, then gaps-and-islands (frame_idx − row_number within
    the speech flag) turns consecutive speech frames into segments —
    per clip: speech ratio, segment count, longest segment. Frame
    energies here are the deterministic synthetic stand-in; the real
    pipeline swaps in RMS energies from a Pandas-UDF PCM decode over
    the binary payload (the mm_audio_meta machinery) and NOTHING else
    changes — the thresholding, islands, and rollup are the operator.
    The bounded per-clip frame explode, partitioned windows, and exact
    integer counts are the same segmentation plan speech pipelines run
    at petabyte scale."""
    docs = load_table(spark, sf_dir, "documents")
    clips = docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") <= 129)
    ).select(
        F.col("doc_id").alias("clip_id"),
        (40 + F.col("doc_id") % 21).cast("int").alias("n_frames"),
    )
    frames = clips.select(
        "clip_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias(
            "frame_idx"
        ),
    ).select(
        "clip_id",
        "frame_idx",
        (
            (
                F.col("clip_id") * 48271
                + F.col("frame_idx") * F.lit(2654435761)
            )
            % F.lit(4294967296)
            % 1000
        )
        .cast("bigint")
        .alias("energy"),
    )
    flagged = frames.select(
        "clip_id",
        "frame_idx",
        (F.col("energy") >= 500).cast("int").alias("speech"),
    )
    wi = Window.partitionBy("clip_id", "speech").orderBy("frame_idx")
    islands = flagged.select(
        "clip_id",
        "speech",
        (F.col("frame_idx") - F.row_number().over(wi)).alias("grp"),
    )
    segs = (
        islands.filter(F.col("speech") == 1)
        .groupBy("clip_id", "grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("seg_len"))
    )
    per_clip = flagged.groupBy("clip_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("speech").cast("bigint").alias("speech_frames"),
    )
    return (
        per_clip.join(
            segs.withColumnRenamed("clip_id", "sclip"),
            F.col("sclip") == F.col("clip_id"),
            "left",
        )
        .groupBy("clip_id", "n_frames", "speech_frames")
        .agg(
            F.count("grp").cast("bigint").alias("n_segments"),
            F.coalesce(F.max("seg_len"), F.lit(0))
            .cast("bigint")
            .alias("longest_segment"),
        )
        .select(
            "clip_id",
            "n_frames",
            "speech_frames",
            F.round(
                F.col("speech_frames").cast("double") / F.col("n_frames"), 4
            ).alias("speech_ratio"),
            "n_segments",
            "longest_segment",
        )
        .orderBy("clip_id")
    )
