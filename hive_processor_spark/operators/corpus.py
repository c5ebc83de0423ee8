"""Corpus-preparation operators for LLM training-data pipelines (round-2
extension of the SURVEY.md §2.2-K text family): benchmark-contamination
check, repetition scoring, sequence packing, deterministic global shuffle,
overlapping chunking, PII scrubbing, and URL parsing.

Everything stays in built-in expressions (whole-stage codegen); the only
shuffles are the ones the semantics force (the contamination join — with
the benchmark side broadcast — the packing window, and the global-shuffle
sort). Per-document work is embarrassingly parallel and survives a 100 TB
corpus unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.functions.textexpr import guarded_fanout, ngram_join
from hive_processor_spark.functions.vector import cosine_q, sql_cosine_q
from hive_processor_spark.sources.tables import load_table


def _tokens() -> Column:
    """Whitespace token array over trimmed ``text`` (single-split discipline,
    shared with :mod:`textops`)."""
    return F.split(F.trim(F.col("text")), " ")


# --------------------------------------------------------------------------
# Repetition scoring — the Gopher-style "fraction of duplicate n-grams"
# quality signal. Pure per-document array math: no shuffle at all.
# --------------------------------------------------------------------------
@register(
    "text_repetition",
    """
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents
    ), b AS (
        SELECT doc_id, w,
               [ARRAY_TO_STRING(w[i:i+1], ' ') FOR i IN RANGE(1, LEN(w))] AS bg
        FROM t
    )
    SELECT doc_id,
           CAST(LEN(w) AS BIGINT) AS n_tokens,
           ROUND((LEN(w) - LEN(LIST_DISTINCT(w))) / CAST(LEN(w) AS DOUBLE), 6)
               AS dup_word_ratio,
           ROUND((LEN(bg) - LEN(LIST_DISTINCT(bg))) / CAST(LEN(bg) AS DOUBLE), 6)
               AS dup_bigram_ratio
    FROM b
    ORDER BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-word and duplicate-bigram ratios per document — the
    repetition filter every corpus-cleaning recipe applies before training.
    One projection, zero shuffles beyond the output sort; at 100 TB this is
    a map-only pass."""
    docs = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        ngram_join(2)
    )
    return (
        docs.select("doc_id", _tokens().alias("w"))
        .select("doc_id", "w", bigrams.alias("bg"))
        .select(
            "doc_id",
            F.size("w").cast("bigint").alias("n_tokens"),
            F.round(
                (F.size("w") - F.size(F.array_distinct("w")))
                / F.size("w").cast("double"),
                6,
            ).alias("dup_word_ratio"),
            F.round(
                (F.size("bg") - F.size(F.array_distinct("bg")))
                / F.size("bg").cast("double"),
                6,
            ).alias("dup_bigram_ratio"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Benchmark contamination — shared-shingle count between each corpus doc
# and a held-out benchmark set. The benchmark shingle set is tiny relative
# to the corpus, so it broadcasts; the corpus side is a map-side hash join,
# never a corpus-wide shuffle.
# --------------------------------------------------------------------------
@register(
    "text_contamination",
    """
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, s
        FROM (
            SELECT doc_id,
                   UNNEST([ARRAY_TO_STRING(w[i:i+4], ' ')
                           FOR i IN RANGE(1, LEN(w) - 3)]) AS s
            FROM t
        )
    ), bench AS (
        SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0
    ), hits AS (
        SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM sh JOIN bench ON sh.s = bench.s
        WHERE sh.doc_id % 50 <> 0
        GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           COALESCE(h.n_shared, 0) AS n_shared,
           COALESCE(h.n_shared, 0) >= 1 AS contaminated
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 50 <> 0
    ORDER BY d.doc_id
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: count 5-gram shingles each corpus
    document shares with a held-out benchmark set (here: every 50th doc,
    standing in for an eval suite). The benchmark shingle set is broadcast —
    at 100 TB the corpus side stays a map-only scan + partial aggregate;
    only the per-doc hit counts shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    shingles = F.expr(
        ngram_join(5)
    )
    sh = (
        docs.select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.explode(shingles).alias("s"))
        .distinct()
    )
    bench = sh.filter(F.col("doc_id") % 50 == 0).select("s").distinct()
    hits = (
        sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        docs.filter(F.col("doc_id") % 50 != 0)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).alias("n_shared"),
            (F.coalesce("n_shared", F.lit(0)) >= 1).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Sequence packing — contiguous greedy packing of documents into
# fixed-token-budget bins, partitioned by source so every partition packs
# independently (the shape a 1000-executor packing job needs; a single
# global ordering would serialize).
# --------------------------------------------------------------------------
@register(
    "pipeline_pack_sequences",
    """
    WITH t AS (
        SELECT source, doc_id,
               CAST(LEN(STRING_SPLIT(TRIM(text), ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), c AS (
        SELECT source, doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM t
    )
    SELECT source,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM c
    GROUP BY source, bin
    ORDER BY source, bin
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 256-token training bins with contiguous greedy
    packing, independently per source. The window partitions by ``source``
    so packing parallelizes across the cluster — no global sort, one
    shuffle on the partition key, then per-bin stats."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        "source", "doc_id", F.size(_tokens()).cast("bigint").alias("n_tokens")
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.select(
            "source",
            F.expr("(cum - n_tokens) div 256").alias("bin"),
            "n_tokens",
        )
        .groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source", "bin")
    )


# --------------------------------------------------------------------------
# Deterministic global shuffle — seeded hash ordering + round-robin shard
# assignment, the "shuffle the corpus once, reproducibly" step before
# training-shard export.
# --------------------------------------------------------------------------
@register(
    "sample_global_shuffle",
    """
    SELECT doc_id,
           CAST((ROW_NUMBER() OVER (
               ORDER BY MD5('r2:' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1) % 8 AS BIGINT) AS shard
    FROM documents
    ORDER BY doc_id
    """,
)
def sample_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic corpus shuffle: order by ``md5(seed || doc_id)``
    and deal docs round-robin into 8 shards. Reproducible across runs and
    engines (the hash is the order key, not a RNG). Round-6 window-audit
    fix: the rank comes from the bucketed two-level machinery — the
    bucket grid lives on the hash's numeric 15-hex-digit prefix
    (monotone in the full hex string: equal-length lowercase hex sorts
    lexicographically = numerically), while the within-bucket order uses
    the full hash + doc_id, so the permutation is identical to the
    single-partition form but never ranks the corpus through one
    task."""
    from hive_processor_spark.functions.orderstat import with_global_order

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("r2:"), F.col("doc_id").cast("string")))
    keyn = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    d = docs.select("doc_id", key.alias("k"), keyn.alias("kn"))
    return (
        with_global_order(d, "kn", ["k", "doc_id"], rank="rn")
        .select(
            "doc_id", ((F.col("rn") - 1) % 8).cast("bigint").alias("shard")
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Overlapping chunking — fixed window / stride token chunks, the context-
# window packing step for long-document training. Map-only fan-out.
# --------------------------------------------------------------------------
@register(
    "text_chunk_overlap",
    """
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents
    ), s AS (
        SELECT doc_id, w, UNNEST(RANGE(1, LEN(w) + 1, 24)) AS i FROM t
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS start,
           CAST(LEN(w[i:i+31]) AS BIGINT) AS n_chunk_tokens,
           ARRAY_TO_STRING(w[i:i+31], ' ') AS chunk
    FROM s
    ORDER BY doc_id, start
    """,
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunks (window 32, stride 24) per document — the
    chunking pass before tokenize-and-pack. One ``sequence`` + ``explode``
    projection per doc; trailing partial chunks are kept (clamped slice),
    matching streaming chunker behavior. Map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    starts = F.expr("sequence(1, size(w), 24)")
    return (
        docs.select("doc_id", _tokens().alias("w"))
        .select("doc_id", F.explode(starts).alias("start"), "w")
        .select(
            "doc_id",
            F.col("start").cast("bigint").alias("start"),
            F.size(F.slice("w", F.col("start"), 32))
            .cast("bigint")
            .alias("n_chunk_tokens"),
            F.array_join(F.slice("w", F.col("start"), 32), " ").alias("chunk"),
        )
        .orderBy("doc_id", "start")
    )


# --------------------------------------------------------------------------
# PII scrubbing — regex redaction over a contact-bearing string. The
# fixture text carries no PII, so the operator synthesizes a deterministic
# contact suffix per doc, then proves the redaction path end-to-end.
# --------------------------------------------------------------------------
_EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "text_pii_scrub",
    f"""
    WITH t AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.org or +1-555-0' || CAST(doc_id % 1000 AS VARCHAR)
                    || REPEAT('0', 3 - LEN(CAST(doc_id % 1000 AS VARCHAR))) AS msg
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(msg, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(msg, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           SUBSTR(REGEXP_REPLACE(REGEXP_REPLACE(msg, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                                 '{_PHONE_RE}', '<PHONE>', 'g'),
                  GREATEST(LEN(msg) - 79, 1), 80) AS scrubbed_tail
    FROM t
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails, phone numbers) with per-doc redaction
    counts. The fixture corpus is synthetic, so a deterministic contact
    suffix is appended first; the scrub itself is exactly what a real
    corpus pass runs — two ``regexp_replace`` over codegen, map-only.
    Patterns stay in the regex subset Java and RE2 share."""
    docs = load_table(spark, sf_dir, "documents")
    msg = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org or +1-555-0"),
        (F.col("doc_id") % 1000).cast("string"),
        F.expr(
            "repeat('0', 3 - length(cast(doc_id % 1000 as string)))"
        ),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(msg, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        docs.select("doc_id", msg.alias("msg"))
        .select(
            "doc_id",
            F.size(F.regexp_extract_all("msg", F.lit(_EMAIL_RE), 0))
            .cast("bigint")
            .alias("n_emails"),
            F.size(F.regexp_extract_all("msg", F.lit(_PHONE_RE), 0))
            .cast("bigint")
            .alias("n_phones"),
            F.substring(
                F.regexp_replace(
                    F.regexp_replace("msg", _EMAIL_RE, "<EMAIL>"),
                    _PHONE_RE,
                    "<PHONE>",
                ),
                F.greatest(F.length("msg") - 79, F.lit(1)),
                80,
            ).alias("scrubbed_tail"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# URL parsing — Spark's parse_url against a regex oracle. The fixture has
# no URL column, so one is synthesized deterministically; the point is the
# engine-side parse_url machinery a web-corpus pipeline leans on.
# --------------------------------------------------------------------------
@register(
    "fn_url",
    """
    WITH t AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        FROM documents
    )
    SELECT doc_id,
           REGEXP_EXTRACT(url, 'https://([^/]+)/', 1) AS host,
           REGEXP_EXTRACT(url, 'https://[^/]+(/[^?]*)', 1) AS path,
           REGEXP_EXTRACT(url, 'lang=([a-z]+)', 1) AS lang_param
    FROM t
    ORDER BY doc_id
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via ``parse_url`` (host / path / query param) — the
    per-document URL normalization step of a web-crawl pipeline. Built-in
    JVM expression, map-only; the DuckDB oracle mirrors it with regexes."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return (
        docs.select("doc_id", url.alias("url"))
        .select(
            "doc_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Domain-level dedup — keep one canonical document per source/domain, the
# coarse "one page per URL-normal-form" pass that precedes content dedup.
# --------------------------------------------------------------------------
@register(
    "dedup_domain",
    """
    SELECT source, doc_id, n_chars
    FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS rn
        FROM documents
    )
    WHERE rn = 1
    ORDER BY source
    """,
)
def dedup_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-per-domain dedup: the longest document (ties → lowest id)
    per source. One window over the domain key — partition-parallel, and at
    100 TB the rank-over-partition shape AQE-handles skewed domains;
    alternatively `max_by` when only the winner (not the rank) is needed."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.select(
            "source", "doc_id", "n_chars", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select("source", "doc_id", "n_chars")
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Capstone: full training-data export in ONE declarative plan —
# quality gate → benchmark-contamination filter → fingerprint dedup →
# seeded shard assignment → per-shard manifest.
# --------------------------------------------------------------------------
@register(
    "pipeline_train_export",
    """
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w FROM documents
    ), q AS (
        SELECT doc_id, w, CAST(LEN(w) AS BIGINT) AS n_tokens
        FROM t
        WHERE LEN(w) >= 20
          AND (LEN(w) - LEN(LIST_DISTINCT(w))) / CAST(LEN(w) AS DOUBLE) <= 0.8
    ), sh AS (
        SELECT DISTINCT doc_id, s
        FROM (
            SELECT doc_id,
                   UNNEST([ARRAY_TO_STRING(w[i:i+4], ' ')
                           FOR i IN RANGE(1, LEN(w) - 3)]) AS s
            FROM t
        )
    ), bench AS (
        SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0
    ), dirty AS (
        SELECT DISTINCT sh.doc_id FROM sh JOIN bench ON sh.s = bench.s
    ), clean AS (
        SELECT q.* FROM q
        LEFT JOIN dirty d ON d.doc_id = q.doc_id
        WHERE d.doc_id IS NULL AND q.doc_id % 50 <> 0
    ), fp AS (
        SELECT doc_id, n_tokens,
               MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(w)), ' ')) AS vocab_fp
        FROM clean
    ), kept AS (
        SELECT f.doc_id, f.n_tokens FROM fp f
        JOIN (SELECT vocab_fp, MIN(doc_id) AS keep_id FROM fp GROUP BY vocab_fp) k
          ON f.vocab_fp = k.vocab_fp AND f.doc_id = k.keep_id
    )
    SELECT CAST((ROW_NUMBER() OVER (
               ORDER BY MD5('exp:' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1) % 4 AS BIGINT) AS shard,
           CAST(COUNT(*) OVER (PARTITION BY 1) AS BIGINT) AS n_total,
           doc_id, n_tokens
    FROM kept
    ORDER BY doc_id
    """,
)
def pipeline_train_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition — the nightly training-data export as one
    Catalyst plan: repetition/length quality gate (map-only) →
    benchmark-contamination exclusion (broadcast shingle anti-join) →
    vocabulary-fingerprint dedup (keep min id) → seeded deterministic
    shard deal. Each stage is individually oracle-verified elsewhere
    (text_repetition, text_contamination, pipeline_clean_corpus,
    sample_global_shuffle); this query pins their composition. Shuffle
    count stays fixed (fingerprint group, shard sort) at any corpus
    size."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    t = docs.select("doc_id", _tokens().alias("w"))
    q = t.select(
        "doc_id", "w", F.size("w").cast("bigint").alias("n_tokens")
    ).filter(
        (F.size("w") >= 20)
        & (
            (F.size("w") - F.size(F.array_distinct("w")))
            / F.size("w").cast("double")
            <= 0.8
        )
    )
    shingles = F.expr(
        ngram_join(5)
    )
    # No (doc_id, s) distinct on the corpus side: membership in `dirty`
    # only needs ANY matching shingle, so the corpus-wide dedup shuffle
    # the round-8 shape paid (1M-row exchange at sf0.1) is pure overhead —
    # the broadcast join stays map-side and only matches reach the
    # doc_id-level distinct. The explode is spread to core count first:
    # the documents scan is a single small file, and a 1-task 5-gram
    # fan-out serializes the whole contamination stage.
    raw_sh = (
        t.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(shingles).alias("s"))
    )
    bench = (
        raw_sh.filter(F.col("doc_id") % 50 == 0).select("s").distinct()
    )
    dirty = (
        raw_sh.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(bench), "s")
        .select("doc_id")
        .distinct()
    )
    clean = (
        q.join(dirty, "doc_id", "left_anti")
        .filter(F.col("doc_id") % 50 != 0)
    )
    fp = clean.select(
        "doc_id",
        "n_tokens",
        F.md5(F.array_join(F.sort_array(F.array_distinct("w")), " ")).alias(
            "vocab_fp"
        ),
    )
    keepers = fp.groupBy("vocab_fp").agg(F.min("doc_id").alias("keep_id"))
    key = F.md5(F.concat(F.lit("exp:"), F.col("doc_id").cast("string")))
    keyn = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    # Round-9 (VERDICT r8 item 4): materialize the survivor set ONCE. It
    # has three consumers — the broadcast total, the rank machinery's
    # bucket aggregate, and the main plan — and its lineage carries the
    # whole gate→contamination→fingerprint pipeline (including the
    # per-doc md5-of-sorted-vocab), which Catalyst would re-derive per
    # consumer. The frame is survivor-sized (≤ |docs| rows, 4 scalars),
    # so the checkpoint is answer-shaped, not corpus-shaped.
    kept = (
        fp.join(
            keepers,
            (fp.vocab_fp == keepers.vocab_fp) & (fp.doc_id == keepers.keep_id),
        )
        .select("doc_id", "n_tokens", key.alias("k"), keyn.alias("kn"))
        .localCheckpoint(eager=True)
    )
    # round-6 window-audit fix: distributed hash rank (see
    # sample_global_shuffle for the hex-prefix bucket-monotonicity
    # argument) + a broadcast total instead of a whole-frame window
    from hive_processor_spark.functions.orderstat import with_global_order

    tot = kept.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    return (
        with_global_order(
            kept,
            "kn",
            ["k", "doc_id"],
            rank="rn",
            # kn is the first 15 hex digits of an md5 — uniform on
            # [0, 16^15); fixed bounds skip the span pre-pass
            bounds=(0.0, float(16**15)),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.col("rn") - 1) % 4).cast("bigint").alias("shard"),
            "n_total",
            "doc_id",
            "n_tokens",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Mixture weighting — deterministic per-source downsampling to a target
# mixture, the "how much of each source goes in the batch" knob of a
# pretraining data recipe.
# --------------------------------------------------------------------------
@register(
    "pipeline_mixture_weights",
    """
    WITH w(source_band, wt) AS (VALUES ('low', 0.25), ('high', 0.75)),
    t AS (
        SELECT doc_id, source,
               CASE WHEN CAST(SUBSTR(source, 4) AS INT) < 10
                    THEN 'high' ELSE 'low' END AS source_band,
               CAST(('0x' || SUBSTR(MD5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967296.0 AS u
        FROM documents
    )
    SELECT t.source_band, w.wt,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN t.u < w.wt THEN 1 END) AS BIGINT) AS n_kept
    FROM t JOIN w ON w.source_band = t.source_band
    GROUP BY t.source_band, w.wt
    ORDER BY t.source_band
    """,
)
def pipeline_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-weighted sampling: each source band gets a target keep rate,
    applied by thresholding a seeded per-doc hash fraction — deterministic,
    reproducible, and exact-in-expectation (the standard pretraining-recipe
    mechanism; E[kept] = wt·n, no RNG state to coordinate across
    executors). Map-only except the per-band count; at 100 TB the weight
    table is a broadcast literal and re-weighting a recipe is a new
    threshold, not a new shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    band = F.when(
        F.substring("source", 4, 10).cast("int") < 10, "high"
    ).otherwise("low")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") / F.lit(4294967296.0)
    weights = spark.createDataFrame(
        [("low", 0.25), ("high", 0.75)], "source_band string, wt double"
    )
    t = docs.select("doc_id", band.alias("source_band"), u.alias("u"))
    return (
        t.join(F.broadcast(weights), "source_band")
        .groupBy("source_band", "wt")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("u") < F.col("wt"), 1)).alias("n_kept"),
        )
        .orderBy("source_band")
    )


# --------------------------------------------------------------------------
# Unigram surprisal — the perplexity-filter proxy: score documents by the
# average information content of their tokens under the corpus unigram
# model. Per-word surprisal is rounded once (per DISTINCT word) before the
# quantized per-doc sum, so the score is bit-stable at any parallelism.
# --------------------------------------------------------------------------
@register(
    "text_surprisal",
    """
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w
        FROM documents
    ), freq AS (
        -- per-word surprisal floor-quantized to integer micro-bits: engine
        -- ROUND tie rules (half-up vs half-even) diverged on sf0.1 vocab
        SELECT w, CAST(FLOOR(-LOG2(COUNT(*)
                   / CAST((SELECT COUNT(*) FROM tok) AS DOUBLE)) * 1000000.0)
                   AS BIGINT) AS qsurprisal
        FROM tok GROUP BY w
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND((CAST(SUM(f.qsurprisal) AS DOUBLE) / 1000000.0) / COUNT(*), 4)
               AS avg_surprisal
    FROM tok t JOIN freq f ON f.w = t.w
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average unigram surprisal per document — the cheap stand-in for the
    LM-perplexity quality filter in corpus-curation recipes (documents of
    all-common tokens score low; rare-token soup scores high). The unigram
    model is one tiny aggregate (vocabulary rows) broadcast back over the
    token stream; per-word surprisal is rounded once per distinct word and
    the per-doc reduction uses the quantized-sum discipline, so the score
    survives any re-partitioning. A real recipe swaps the broadcast unigram
    table for a KenLM scorer behind the same join shape."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("w"))
    n_total = tok.count()  # one scalar: the unigram model's denominator
    # integer micro-bit surprisal per DISTINCT word (floor, never ROUND:
    # engine rounding tie rules diverge — caught by the sf0.1 sweep), the
    # integer carried through the per-doc sum so no re-quantization ever
    # re-tests a grid boundary
    freq = tok.groupBy("w").agg(
        F.floor(
            -F.log2(F.count(F.lit(1)) / F.lit(float(n_total))) * 1e6
        )
        .cast("long")
        .alias("qsurprisal")
    )
    return (
        tok.join(F.broadcast(freq), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                (F.sum("qsurprisal").cast("double") / 1e6) / F.count(F.lit(1)),
                4,
            ).alias("avg_surprisal"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Hashed bag-of-words featurization — HashingTF expressed relationally:
# token → stable hash dimension, per-doc count vector, cosine retrieval.
# The bridge from the text plane to the embedding plane without any ML
# library state.
# --------------------------------------------------------------------------
_BOW_DIMS = 32


@register(
    "text_hash_features",
    f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS w FROM documents
    ), hashed AS (
        SELECT doc_id,
               CAST(('0x' || SUBSTR(MD5(w), 1, 8)) AS BIGINT) % {_BOW_DIMS} AS dim
        FROM tok
    ), counts AS (
        SELECT doc_id, dim, CAST(COUNT(*) AS DOUBLE) AS n
        FROM hashed GROUP BY doc_id, dim
    ), grid AS (
        SELECT d.doc_id, g.dim, COALESCE(c.n, 0.0) AS n
        FROM (SELECT DISTINCT doc_id FROM documents) d
        CROSS JOIN (SELECT UNNEST(RANGE(0, {_BOW_DIMS})) AS dim) g
        LEFT JOIN counts c ON c.doc_id = d.doc_id AND c.dim = g.dim
    ), vecs AS (
        SELECT doc_id, LIST(n ORDER BY dim) AS v FROM grid GROUP BY doc_id
    ), q AS (
        SELECT v AS qv FROM vecs WHERE doc_id = 0
    )
    SELECT e.doc_id,
           ROUND({sql_cosine_q('e.v', 'q.qv')}, 4) AS sim
    FROM vecs e, q
    WHERE e.doc_id <> 0
    ORDER BY sim DESC, e.doc_id
    LIMIT 10
    """,
)
def text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words features (HashingTF relationally): every token
    maps to a stable md5-derived dimension, per-doc counts become a dense
    32-dim vector, and retrieval is quantized cosine against doc 0 — the
    text→vector bridge with zero ML-library state, so the featurizer is
    reproducible across engines and runs. At 100 TB keep the SPARSE
    (doc, dim, n) form and only densify per block; integer counts make the
    cosine exactly deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(_tokens()).alias("w"))
    hashed = tok.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % _BOW_DIMS
        ).alias("dim"),
    )
    counts = hashed.groupBy("doc_id", "dim").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    grid = (
        docs.select("doc_id")
        .crossJoin(spark.range(_BOW_DIMS).select(F.col("id").alias("dim")))
        .join(counts, ["doc_id", "dim"], "left")
        .select("doc_id", "dim", F.coalesce("n", F.lit(0.0)).alias("n"))
    )
    vecs = grid.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "n"))), lambda s: s.n
        ).alias("v")
    )
    q = vecs.filter(F.col("doc_id") == 0).select(F.col("v").alias("qv"))
    return (
        vecs.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id", F.round(cosine_q(F.col("v"), F.col("qv")), 4).alias("sim")
        )
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "pipeline_dataset_card",
    """
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(TRIM(text), ' '), x -> x <> '')))
                AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT MD5(text)) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card statistics — the per-(lang, source) summary table every
    released training corpus ships: document counts, token and character
    totals, exact-duplicate counts, and short-document counts, in ONE scan.
    Every measure is an integer (counts, distinct hashes), so the card is
    bit-stable by construction; the distinct-hash count is the only
    aggregate that shuffles more than the group keys, and it shuffles
    16-byte digests, not documents. At 100 TB this query IS the nightly
    corpus-health snapshot — one pass, |lang × source| result rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.trim(F.col("text")), " "), lambda x: x != "")
    )
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks.cast("bigint")).alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
            F.sum((F.col("n_chars") < 100).cast("bigint")).alias("n_short"),
        )
        .orderBy("lang", "source")
    )


# --------------------------------------------------------------------------
# BM25 retrieval scoring — the classic sparse-retrieval ranking function,
# here as a batch scoring pass for a fixed two-term query. The corpus-side
# statistics (N, avgdl, per-term df) are tiny aggregates broadcast back
# onto the per-document term frequencies; the per-document work is one
# tokenize + filter, embarrassingly parallel at 100 TB.
#
# Determinism: tf/dl/df/N are exact integers; avgdl is an exact-integer
# ratio; idf and the saturation term are evaluated with an identical
# parenthesization on both engines, and the two per-term contributions are
# combined with a single commutative double addition (IEEE a+b == b+a), so
# the final score is bit-stable at any parallelism.
# --------------------------------------------------------------------------
_BM25_TERMS = ("join", "hash")
_BM25_K1 = 1.2
_BM25_B = 0.75


@register(
    "text_bm25",
    f"""
    WITH tok AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(TRIM(text), ' ')) AS word
        FROM documents
    ), tok2 AS (
        SELECT doc_id, word FROM tok WHERE word <> ''
    ), dl AS (
        SELECT d.doc_id,
               CAST(COALESCE(t.n, 0) AS BIGINT) AS dl
        FROM documents d
        LEFT JOIN (SELECT doc_id, COUNT(*) AS n FROM tok2 GROUP BY doc_id) t
          ON d.doc_id = t.doc_id
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
        FROM dl
    ), tf AS (
        SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok2 WHERE word IN ('join', 'hash')
        GROUP BY doc_id, word
    ), dfreq AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word
    ), contrib AS (
        SELECT tf.doc_id,
               LN((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)
               * (CAST(tf AS DOUBLE) * {_BM25_K1 + 1.0!r})
               / (CAST(tf AS DOUBLE)
                  + {_BM25_K1!r} * (1.0 - {_BM25_B!r}
                                    + {_BM25_B!r} * CAST(dl AS DOUBLE) / avgdl))
                   AS c
        FROM tf
        JOIN dfreq USING (word)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
    )
    SELECT doc_id, ROUND(SUM(c), 4) AS bm25
    FROM contrib
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 (k1=1.2, b=0.75) for the fixed query
    ``join hash``. Corpus stats are broadcast scalars; per-doc scoring is a
    map-only pass over the tokenized corpus."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(_tokens(), lambda x: x != F.lit(""))
    dl = docs.select("doc_id", F.size(words).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
    )
    tf = (
        docs.select("doc_id", F.explode(words).alias("word"))
        .filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    idf = F.log(
        (d("n_docs") - d("df") + F.lit(0.5)) / (d("df") + F.lit(0.5)) + F.lit(1.0)
    )
    saturation = (d("tf") * F.lit(_BM25_K1 + 1.0)) / (
        d("tf")
        + F.lit(_BM25_K1)
        * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * d("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * saturation).alias("c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("c"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


@register(
    "pipeline_shard_balance",
    """
    WITH h AS (
        SELECT doc_id, n_chars, MD5(CAST(doc_id AS VARCHAR)) AS hk
        FROM documents
    ), c AS (
        SELECT doc_id, n_chars, hk,
               SUM(n_chars) OVER (ORDER BY hk, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_chars AS start_off
        FROM h
    )
    SELECT CAST(FLOOR(CAST(start_off AS DOUBLE) / 5000.0) AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM c
    GROUP BY shard
    ORDER BY shard
    """,
)
def pipeline_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced shard assignment: documents are laid out in a
    deterministic hash order (so co-sourced documents scatter), then cut
    into ~5000-char shards by cumulative start offset — the bin-packing
    pass that turns a cleaned corpus into training shards of near-equal
    byte size regardless of per-document skew.

    The cumulative sum IS the two-pass range-partitioned prefix sum —
    explicitly, via the bucketed two-level machinery (round-6
    window-audit fix: Spark's unpartitioned running window does NOT
    split; it moves every row through one task): buckets on the hash's
    numeric 15-hex-digit prefix (monotone in the hex string), bucket
    totals prefix-summed over the bounded bucket frame, per-row offsets
    from windows partitioned by bucket. Integer arithmetic throughout,
    so shard cuts are bit-stable."""
    from hive_processor_spark.functions.orderstat import with_global_order

    docs = load_table(spark, sf_dir, "documents")
    hk = F.md5(F.col("doc_id").cast("string"))
    h = docs.select(
        "doc_id",
        "n_chars",
        hk.alias("hk"),
        F.conv(F.substring(hk, 1, 15), 16, 10).cast("long").alias("kn"),
    )
    c = with_global_order(
        h, "kn", ["hk", "doc_id"], cumsums={"cs": "n_chars"}
    ).select(
        "doc_id",
        "n_chars",
        (F.col("cs") - F.col("n_chars")).alias("start_off"),
    )
    shard = F.floor(F.col("start_off").cast("double") / 5000.0).cast("bigint")
    return (
        c.groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("shard")
    )


# Tier R: zlib is not expressible in the DuckDB oracle; semantic guarantees
# (ratio bounds, repetition ordering) live in tests/test_properties.py.
@register("text_compress_ratio")
def text_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: deflate(level 6) bytes over raw
    bytes per document — highly repetitive/boilerplate text compresses far
    below ~0.4, near-random text sits close to 1.0; corpus-cleaning recipes
    cut both tails. zlib is pure CPU with no cross-row state, so this runs
    as an Arrow-batched ``mapInPandas`` pass — embarrassingly parallel,
    no shuffle, scan-bound at 100 TB."""
    import pandas as pd  # local import keeps the module import-light

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def score(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            comp = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "compress_ratio": (
                        comp / n_bytes.clip(lower=1)
                    ).round(4),
                }
            )

    out = docs.mapInPandas(
        score, "doc_id bigint, n_bytes bigint, compress_ratio double"
    )
    return out.orderBy("doc_id")


@register(
    "pipeline_tokenize_budget",
    """
    WITH per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT(TRIM(text), ' '),
                                        w -> w <> ''))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ), ranked AS (
        SELECT source, n_docs, n_tokens,
               SUM(n_tokens) OVER (ORDER BY n_tokens DESC, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM per_source
    )
    SELECT source, n_docs, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(CASE WHEN cum_tokens <= 20000 THEN 1 ELSE 0 END AS INTEGER)
               AS in_budget
    FROM ranked
    ORDER BY n_tokens DESC, source
    """,
)
def pipeline_tokenize_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget planning: per-source token totals ranked and
    cumulatively summed against a 20k-token training budget — the "which
    sources fit this run" allocation every pretraining mix starts from.
    Token counts are one tokenize+count pass (map-only per doc, partial→
    final per source); the budget window runs over |sources| rows. All
    integers, so the in/out budget cut cannot flip."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.trim(F.col("text")), " "), lambda x: x != F.lit(""))
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).cast("long").alias("n_tokens"),
    )
    w = Window.orderBy(F.desc("n_tokens"), F.asc("source")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_source.select(
            "source",
            "n_docs",
            "n_tokens",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        )
        .select(
            "*",
            F.when(F.col("cum_tokens") <= 20000, 1).otherwise(0).alias("in_budget"),
        )
        .orderBy(F.desc("n_tokens"), "source")
    )


@register(
    "text_augment_dropout",
    """
    WITH tok AS (
        SELECT doc_id, word,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos)
                    AS BIGINT) AS pos
        FROM (
            SELECT doc_id, UNNEST(w) AS word,
                   GENERATE_SUBSCRIPTS(w, 1) AS pos
            FROM (SELECT doc_id,
                         LIST_FILTER(STRING_SPLIT(TRIM(text), ' '),
                                     x -> x <> '') AS w
                  FROM documents) t
        )
    ), kept AS (
        SELECT doc_id, word, pos
        FROM tok
        WHERE ('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || ':'
                                     || CAST(pos AS VARCHAR)), 1, 8))::BIGINT
              % 10 <> 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MD5(STRING_AGG(word, ' ' ORDER BY pos)) AS aug_md5
    FROM kept
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_augment_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic word-dropout augmentation: each token is dropped when
    hash(doc, position) ≡ 0 (mod 10) — the seeded 10% token-dropout pass a
    training pipeline applies for robustness, REPRODUCIBLE across reruns
    and engines because the randomness is a content-addressed hash, not an
    RNG. The augmented text is emitted as an order-preserving md5 so the
    oracle verifies the exact surviving sequence. Map-only per document;
    the only shuffle is the per-doc regroup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.trim(F.col("text")), " "), lambda x: x != F.lit(""))
    tok = docs.select(
        "doc_id", F.posexplode(toks).alias("pos0", "word")
    ).select("doc_id", "word", (F.col("pos0") + 1).cast("long").alias("pos"))
    slot = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    kept = tok.filter(slot != 0)
    item = F.struct(F.col("pos"), F.col("word"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(item)), lambda x: x.getField("word")
                    ),
                    " ",
                )
            ).alias("aug_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_dataset_hash",
    """
    WITH h AS (
        SELECT 'documents' AS tbl,
               ('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR) || '|' || text
                                      || '|' || lang || '|' || source), 1, 15))::BIGINT
                   AS rh
        FROM documents
        UNION ALL
        SELECT 'nation' AS tbl,
               ('0x' || SUBSTRING(MD5(CAST(n_nationkey AS VARCHAR) || '|' || n_name
                                      || '|' || CAST(n_regionkey AS VARCHAR)), 1, 15))::BIGINT
        FROM nation
    )
    SELECT tbl,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(rh) % 9223372036854775807 AS BIGINT) AS content_hash
    FROM h
    GROUP BY tbl
    ORDER BY tbl
    """,
)
def pipeline_dataset_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset content fingerprint: an order-insensitive per-table hash
    (sum of per-row md5-prefix integers, mod a large prime bound) plus row
    count — the provenance primitive that answers "is this exactly the
    dataset the model trained on?" without sorting or moving data. The
    commutative sum makes it partition-order free by construction, so the
    fingerprint is stable on any cluster layout; at 100 TB it's one
    map-side-combined pass per table. Two tables here demonstrate the
    cross-table manifest shape."""
    docs = load_table(spark, sf_dir, "documents")
    nation = load_table(spark, sf_dir, "nation")

    def fp(df: DataFrame, tbl: str, concat) -> DataFrame:
        rh = F.conv(F.substring(F.md5(concat), 1, 15), 16, 10).cast("long")
        # 60-bit row hashes summed over millions of rows overflow int64;
        # accumulate in DECIMAL(38,0) (the oracle's HUGEINT twin), then
        # reduce mod 2^63-1 back into BIGINT range.
        return df.select(rh.cast("decimal(38,0)").alias("rh")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum("rh") % F.lit(9223372036854775807).cast("decimal(38,0)"))
            .cast("long")
            .alias("content_hash"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "content_hash")

    doc_cat = F.concat_ws(
        "|", F.col("doc_id").cast("string"), "text", "lang", "source"
    )
    nat_cat = F.concat_ws(
        "|",
        F.col("n_nationkey").cast("string"),
        "n_name",
        F.col("n_regionkey").cast("string"),
    )
    return fp(docs, "documents", doc_cat).unionByName(
        fp(nation, "nation", nat_cat)
    ).orderBy("tbl")


@register(
    "pipeline_rejection_sample",
    """
    WITH scored AS (
        SELECT doc_id,
               LEAST(900000, n_chars * 2000) AS accept_millionths,
               (('0x' || SUBSTRING(MD5('rs' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT)
                   % 1000000 AS draw
        FROM documents
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN draw < accept_millionths THEN 1 END) AS BIGINT)
               AS n_accepted,
           ROUND(CAST(COUNT(CASE WHEN draw < accept_millionths THEN 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS accept_rate,
           ROUND(CAST(SUM(accept_millionths) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
               AS expected_rate
    FROM scored
    """,
)
def pipeline_rejection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional rejection sampling: each document is accepted
    with probability ∝ its quality proxy (length-capped), decided by a
    content-addressed hash draw instead of an RNG — the deterministic
    acceptance pass a data-mixing recipe uses so reruns and engines agree
    document-by-document. Reports realized vs expected acceptance (they
    should be close — the hash is uniform). Map-only; one global
    aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    accept = F.least(F.lit(900000), F.col("n_chars") * 2000)
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("rs"), F.col("doc_id").cast("string"))), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    scored = docs.select(accept.alias("am"), draw.alias("draw"))
    acc = F.count(F.when(F.col("draw") < F.col("am"), 1))
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        acc.cast("long").alias("n_accepted"),
        F.round(acc.cast("double") / F.count(F.lit(1)), 6).alias("accept_rate"),
        F.round(
            F.sum("am").cast("double") / F.count(F.lit(1)) / 1000000.0, 6
        ).alias("expected_rate"),
    )

_DIFF_FP_SQL = (
    "md5(concat_ws('|', o_custkey, o_orderstatus,"
    " CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)))"
)


@register(
    "pipeline_dataset_diff",
    f"""
    WITH old AS (
        SELECT o_orderkey, {_DIFF_FP_SQL} AS fp FROM orders
    ), new AS (
        SELECT o_orderkey,
               md5(concat_ws('|', o_custkey, o_orderstatus,
                   CAST(FLOOR((o_totalprice
                       + CASE WHEN o_orderkey % 89 = 0 THEN 10.0 ELSE 0.0 END)
                       * 100.0) AS BIGINT))) AS fp
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, {_DIFF_FP_SQL}
        FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT CAST(COUNT(*) FILTER (WHERE old.o_orderkey IS NULL) AS BIGINT)
               AS n_added,
           CAST(COUNT(*) FILTER (WHERE new.o_orderkey IS NULL) AS BIGINT)
               AS n_removed,
           CAST(COUNT(*) FILTER (WHERE old.o_orderkey IS NOT NULL
                AND new.o_orderkey IS NOT NULL AND old.fp <> new.fp) AS BIGINT)
               AS n_changed,
           CAST(COUNT(*) FILTER (WHERE old.o_orderkey IS NOT NULL
                AND new.o_orderkey IS NOT NULL AND old.fp = new.fp) AS BIGINT)
               AS n_unchanged
    FROM old FULL JOIN new ON old.o_orderkey = new.o_orderkey
    """,
)
def pipeline_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff — the audit every training-data release runs:
    count rows added / removed / changed / unchanged between two versions,
    detected by key presence and a row content fingerprint. The "new"
    version is derived deterministically from the fixture (drop keys
    ≡0 mod 97, reprice keys ≡0 mod 89, append re-keyed clones of keys
    ≡0 mod 101), so both engines diff the same pair.

    Shape: one full outer join keyed by the primary key, fingerprints
    compared post-join — shuffle ∝ |old|+|new| on the key, the minimal
    cost of an exact diff. The fingerprint hashes only engine-stable
    scalars (ints, strings, quantized money), per §2.3."""
    orders = load_table(spark, sf_dir, "orders")
    fp_of = lambda price: F.md5(  # noqa: E731
        F.concat_ws(
            "|",
            F.col("o_custkey"),
            F.col("o_orderstatus"),
            F.floor(price * 100.0).cast("bigint"),
        )
    )
    old = orders.select("o_orderkey", fp_of(F.col("o_totalprice")).alias("fp"))
    changed_price = F.col("o_totalprice") + F.when(
        F.col("o_orderkey") % 89 == 0, 10.0
    ).otherwise(0.0)
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select("o_orderkey", fp_of(changed_price).alias("fp"))
        .unionAll(
            orders.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                fp_of(F.col("o_totalprice")).alias("fp"),
            )
        )
    )
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full")
    both = F.col("o.o_orderkey").isNotNull() & F.col("n.o_orderkey").isNotNull()
    return j.agg(
        F.count_if(F.col("o.o_orderkey").isNull()).alias("n_added"),
        F.count_if(F.col("n.o_orderkey").isNull()).alias("n_removed"),
        F.count_if(both & (F.col("o.fp") != F.col("n.fp"))).alias("n_changed"),
        F.count_if(both & (F.col("o.fp") == F.col("n.fp"))).alias("n_unchanged"),
    )

@register(
    "pipeline_temperature_weights",
    """
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    ), w AS (
        SELECT source, n_docs, n_chars,
               CAST(FLOOR(1000000000.0 * POW(CAST(n_chars AS DOUBLE), 0.7))
                    AS BIGINT) AS wq
        FROM s
    )
    SELECT source, n_docs, n_chars,
           ROUND(CAST(n_chars AS DOUBLE) / SUM(n_chars) OVER (), 6)
               AS natural_share,
           ROUND(CAST(wq AS DOUBLE) / SUM(wq) OVER (), 6) AS temp_share,
           ROUND((CAST(wq AS DOUBLE) / SUM(wq) OVER ())
                 / (CAST(n_chars AS DOUBLE) / SUM(n_chars) OVER ()), 4)
               AS upsample_factor
    FROM w ORDER BY source
    """,
)
def pipeline_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (α = 0.7) per corpus source:
    sampling share ∝ size^α — the standard multilingual/multi-source
    pretraining recipe that upsamples small sources without letting any
    source dominate (α=1 is natural sampling, α=0 uniform). Reports the
    natural share, the temperature share, and the implied up/downsampling
    factor per source. One partial→final aggregate; the pow/normalize
    algebra runs over one row per source, with pow outputs
    nano-quantized so the normalized shares are bit-stable."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    wq = F.floor(
        F.lit(1000000000.0) * F.pow(F.col("n_chars").cast("double"), 0.7)
    ).cast("bigint")
    w = s.select("source", "n_docs", "n_chars", wq.alias("wq"))
    wall = Window.partitionBy()
    nat = F.col("n_chars").cast("double") / F.sum("n_chars").over(wall)
    tmp = F.col("wq").cast("double") / F.sum("wq").over(wall)
    return w.select(
        "source",
        "n_docs",
        "n_chars",
        F.round(nat, 6).alias("natural_share"),
        F.round(tmp, 6).alias("temp_share"),
        F.round(tmp / nat, 4).alias("upsample_factor"),
    ).orderBy("source")


@register(
    "pipeline_interleave_sources",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY MD5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rank_in_source
        FROM documents
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY rank_in_source, source, doc_id)
                AS BIGINT) AS position,
           doc_id, source,
           CAST(rank_in_source AS INT) AS rank_in_source
    FROM ranked
    ORDER BY position LIMIT 30
    """,
)
def pipeline_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order: shuffle each source
    internally by key hash (replay-stable, unlike rand()), then emit
    round-robin across sources — the curriculum layout that stops a
    source-sorted corpus from feeding a model hour-long single-domain
    streams. Plan (round-6 window-audit fix): one rank window per source
    (shuffle keyed on source), and because only the first 30 positions
    are emitted, every surviving row has rank_in_source ≤ 30 — the
    rank filter right after row_number lets Spark's WindowGroupLimit
    keep only each source's top 30 through the sort, and the global
    order collapses to TakeOrderedAndProject(30) + a rank window over
    that provably-30-row frame. The old form ranked the whole corpus
    through one partition to throw away all but 30 rows."""
    docs = load_table(spark, sf_dir, "documents")
    ranked = docs.select(
        "doc_id",
        "source",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
            )
        )
        .alias("rank_in_source"),
    ).filter(F.col("rank_in_source") <= 30)
    lim = ranked.orderBy("rank_in_source", "source", "doc_id").limit(30)
    return (
        lim.select(
            F.row_number()
            .over(Window.orderBy("rank_in_source", "source", "doc_id"))
            .cast("bigint")
            .alias("position"),
            "doc_id",
            "source",
            F.col("rank_in_source").cast("int").alias("rank_in_source"),
        )
        .orderBy("position")
    )


@register(
    "pipeline_fair_allocation",
    """
    WITH demand AS (
        SELECT source,
               CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ), budget AS (
        SELECT CAST(FLOOR(0.5 * SUM(tokens)) AS BIGINT) AS b,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM demand
    ), ranked AS (
        SELECT source, tokens,
               ROW_NUMBER() OVER (ORDER BY tokens, source) AS rn,
               SUM(tokens) OVER (ORDER BY tokens, source) AS prefix
        FROM demand
    ), sat AS (
        -- a source is fully satisfiable iff granting every source up to
        -- its demand level still fits the budget (water-filling)
        SELECT r.*, b.b, b.n,
               (r.prefix + r.tokens * (b.n - r.rn) <= b.b) AS is_full
        FROM ranked r, budget b
    ), lvl AS (
        SELECT MAX(CASE WHEN is_full THEN rn ELSE 0 END) AS j,
               MAX(CASE WHEN is_full THEN prefix ELSE 0 END) AS pj,
               MAX(b) AS b, MAX(n) AS n
        FROM sat
    )
    SELECT s.source,
           CAST(s.tokens AS BIGINT) AS demand,
           CAST(CASE WHEN s.is_full THEN s.tokens
                     ELSE FLOOR((l.b - l.pj) / (l.n - l.j)) END AS BIGINT)
               AS allocation,
           s.is_full AS fully_satisfied
    FROM sat s, lvl l
    ORDER BY s.source
    """,
)
def pipeline_fair_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) token allocation: give every source as
    much of a 50%-of-corpus token budget as possible without any source
    gaining while a poorer one is capped — the sampling-budget allocator
    for mixture building when small sources must not be drowned out.
    Closed form, no iteration: sort demands ascending, a source is fully
    satisfiable iff prefix + demand×(remaining sources) fits the budget;
    everyone else gets the common water level (B − prefix_j)/(n − j).
    Plan: one token-count aggregation (shuffle ∝ sources), one rank/prefix
    window over the ~20-row demand frame, exact integer arithmetic
    throughout — floor of identical doubles for the final level."""
    docs = load_table(spark, sf_dir, "documents")
    demand = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("bigint").alias("tokens")
    )
    budget = demand.agg(
        F.floor(0.5 * F.sum("tokens")).cast("bigint").alias("b"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    w = Window.orderBy("tokens", "source")
    ranked = demand.select(
        "source",
        "tokens",
        F.row_number().over(w).alias("rn"),
        F.sum("tokens").over(w).alias("prefix"),
    )
    sat = ranked.crossJoin(F.broadcast(budget)).withColumn(
        "full",
        F.col("prefix") + F.col("tokens") * (F.col("n") - F.col("rn"))
        <= F.col("b"),
    )
    lvl = sat.agg(
        F.max(F.when(F.col("full"), F.col("rn")).otherwise(0)).alias("j"),
        F.max(F.when(F.col("full"), F.col("prefix")).otherwise(0)).alias("pj"),
        F.max("b").alias("lvl_b"),
        F.max("n").alias("lvl_n"),
    )
    return (
        sat.crossJoin(F.broadcast(lvl))
        .select(
            "source",
            F.col("tokens").cast("bigint").alias("demand"),
            F.when(F.col("full"), F.col("tokens"))
            .otherwise(
                F.floor(
                    (F.col("lvl_b") - F.col("pj"))
                    / (F.col("lvl_n") - F.col("j"))
                )
            )
            .cast("bigint")
            .alias("allocation"),
            F.col("full").alias("fully_satisfied"),
        )
        .orderBy("source")
    )


@register(
    "sample_bottom_k",
    """
    WITH h AS (
        SELECT source, doc_id,
               (doc_id * 2654435761) % 4294967296 AS bucket_hash
        FROM documents
    ),
    r AS (
        SELECT source, doc_id, bucket_hash,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY bucket_hash, doc_id
               ) AS sample_rank
        FROM h
    )
    SELECT source, CAST(sample_rank AS BIGINT) AS sample_rank, doc_id,
           CAST(bucket_hash AS BIGINT) AS bucket_hash
    FROM r WHERE sample_rank <= 3
    ORDER BY source, sample_rank
    """,
)
def sample_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic bottom-k-by-hash sample per source — the distributed
    reservoir: the k docs with the smallest Knuth multiplicative hash are
    a uniform random-looking sample that is REPRODUCIBLE across runs,
    engines, and partitionings (no RNG state), mergeable across shards
    (union then re-take bottom-k), and stable under corpus appends except
    where a new doc genuinely displaces one. Arithmetic hash
    ``(doc_id * 2654435761) mod 2^32`` keeps both engines bit-identical
    where murmur seeds would diverge. One shuffle on source; map-side
    partial top-k applies since bottom-k is an order statistic."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source",
        "doc_id",
        ((F.col("doc_id") * 2654435761) % 4294967296).alias("bucket_hash"),
    )
    w = Window.partitionBy("source").orderBy("bucket_hash", "doc_id")
    return (
        h.select(
            "source",
            F.row_number().over(w).cast("bigint").alias("sample_rank"),
            "doc_id",
            F.col("bucket_hash").cast("bigint"),
        )
        .filter(F.col("sample_rank") <= 3)
        .orderBy("source", "sample_rank")
    )


@register(
    "sample_weighted_bottom_k",
    """
    WITH keyed AS (
        SELECT doc_id, n_chars,
               CAST(FLOOR(
                   -LN(((doc_id * 2654435761) % 4294967296 + 0.5)
                       / 4294967296.0)
                   / CAST(n_chars AS DOUBLE) * 1e12) AS BIGINT) AS key_q
        FROM documents
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY key_q, doc_id) AS INT) AS rank,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS weight,
           ROUND(key_q / 1e12, 6) AS key
    FROM keyed
    ORDER BY key_q, doc_id LIMIT 50
    """,
)
def sample_weighted_bottom_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement as a DETERMINISTIC bottom-k:
    the Efraimidis–Spirakis exponential-race scheme (each doc draws
    key = −ln(u)/w; the k smallest keys are a weight-proportional sample
    without replacement). The uniform u is derived from a Knuth
    multiplicative hash of doc_id — no RNG state, so every engine, run,
    and partitioning selects the SAME 50 docs (weight = n_chars: longer
    docs proportionally likelier, the classic token-budget sampler).
    Keys are floor-quantized to integer picounits so ordering and
    tie-breaks are exact-integer comparisons. Scale shape: pure map +
    ORDER BY LIMIT k, which Spark compiles to TakeOrderedAndProject —
    per-partition k-heaps, only k rows ever reach the driver-side merge;
    no global sort, no shuffle of the corpus. This is how you sample a
    weighted 10M-doc subset from a 100 TB corpus in one pass."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296) + 0.5
    ) / 4294967296.0
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.floor(-F.ln(u) / F.col("n_chars").cast("double") * 1e12)
        .cast("bigint")
        .alias("key_q"),
    )
    w = Window.orderBy("key_q", "doc_id")
    return (
        keyed.orderBy("key_q", "doc_id")
        .limit(50)
        .select(
            F.row_number().over(w).cast("int").alias("rank"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_chars").cast("bigint").alias("weight"),
            F.round(F.col("key_q") / 1e12, 6).alias("key"),
        )
    )


@register(
    "pipeline_dp_noise",
    """
    WITH g AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_true,
               ASCII(SUBSTR(lang, 1, 1)) * 256 + ASCII(SUBSTR(lang, 2, 1))
                   AS key
        FROM documents GROUP BY 1
    ), u AS (
        SELECT lang, n_true,
               ((key * 2654435761) % 4294967296 + 0.5) / 4294967296.0 AS uu
        FROM g
    ), noise AS (
        SELECT lang, n_true,
               -1.0 * (CASE WHEN uu >= 0.5 THEN 1.0 ELSE -1.0 END)
                    * LN(1.0 - 2.0 * ABS(uu - 0.5)) AS eps_noise
        FROM u
    )
    SELECT lang, n_true,
           CAST(1.0 AS DOUBLE) AS epsilon,
           ROUND(eps_noise, 6) AS noise,
           CAST(GREATEST(0, CAST(ROUND(n_true + eps_noise, 0) AS BIGINT))
                AS BIGINT) AS n_released
    FROM noise ORDER BY lang
    """,
)
def pipeline_dp_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release per language (ε = 1, Laplace
    mechanism, sensitivity 1 — one document changes each count by at most
    1): the privacy-preserving aggregate release a data pipeline publishes
    instead of raw counts. The Laplace draw is DETERMINISTIC — the
    uniform comes from a Knuth multiplicative hash of the group key and
    is inverted through the Laplace CDF (sign·ln(1−2|u−½|)) — so the
    release is reproducible across engines, runs, and partitionings (a
    seeded release; a production system would key the hash with a secret
    per-release salt, same plan). Shape: one grouped count, then pure
    per-row algebra on the tiny group frame; at 100 TB the count pass is
    the whole cost and the released frame never exceeds the group
    cardinality."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    key = F.ascii(F.substring("lang", 1, 1)) * 256 + F.ascii(
        F.substring("lang", 2, 1)
    )
    uu = ((key * F.lit(2654435761)) % F.lit(4294967296) + 0.5) / 4294967296.0
    eps_noise = (
        -1.0
        * F.when(uu >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.ln(1.0 - 2.0 * F.abs(uu - 0.5))
    )
    return (
        g.select(
            "lang",
            "n_true",
            F.lit(1.0).cast("double").alias("epsilon"),
            F.round(eps_noise, 6).alias("noise"),
            F.greatest(
                F.lit(0).cast("bigint"),
                F.round(F.col("n_true") + eps_noise, 0).cast("bigint"),
            )
            .cast("bigint")
            .alias("n_released"),
        )
        .orderBy("lang")
    )


@register(
    "pipeline_curriculum",
    """
    WITH tok AS (
        SELECT doc_id, t,
               LENGTH(REGEXP_REPLACE(t, '[aeiouy]+', '#', 'g'))
               - LENGTH(REPLACE(REGEXP_REPLACE(t, '[aeiouy]+', '#', 'g'),
                                '#', '')) AS syl
        FROM (SELECT doc_id, UNNEST(STR_SPLIT(text, ' ')) AS t
              FROM documents)
        WHERE t <> ''
    ), d AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS words,
               CAST(SUM(GREATEST(syl, 1)) AS BIGINT) AS syllables
        FROM tok GROUP BY 1
    ), scored AS (
        -- difficulty = avg syllables per word, micro-quantized
        SELECT doc_id, words,
               CAST(FLOOR(CAST(syllables AS DOUBLE) / words * 1e6)
                    AS BIGINT) AS diff_q
        FROM d
    ), staged AS (
        SELECT doc_id, words, diff_q,
               NTILE(4) OVER (ORDER BY diff_q, doc_id) AS stage
        FROM scored
    )
    SELECT CAST(stage AS INT) AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS token_budget,
           ROUND(MIN(diff_q) / 1e6, 4) AS min_difficulty,
           ROUND(MAX(diff_q) / 1e6, 4) AS max_difficulty
    FROM staged GROUP BY 1 ORDER BY stage
    """,
)
def pipeline_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning stage assignment: score every document's
    difficulty (mean syllables per word, micro-quantized), quartile the
    corpus into four easy→hard stages with NTILE over the integer
    score, and report each stage's doc count, token budget, and
    difficulty band — the ordered-training-data manifest
    curriculum-based LLM training consumes (start easy, grow hard).
    Quantized integer difficulty + doc_id tie-breaks make the stage
    assignment bit-deterministic, which matters because a training run
    must see the SAME curriculum on every rebuild. One explode+agg,
    distributed NTILE (round-6 window-audit fix — bucketed two-level
    rank + tile arithmetic; the doc frame never ranks through one
    partition), one stage rollup."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
        .select(
            "doc_id",
            (
                F.length(F.regexp_replace("t", "[aeiouy]+", "#"))
                - F.length(
                    F.replace(
                        F.regexp_replace("t", "[aeiouy]+", "#"),
                        F.lit("#"),
                        F.lit(""),
                    )
                )
            ).alias("syl"),
        )
    )
    d = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("words"),
        F.sum(F.greatest(F.col("syl"), F.lit(1)))
        .cast("bigint")
        .alias("syllables"),
    )
    scored = d.select(
        "doc_id",
        "words",
        F.floor(F.col("syllables").cast("double") / F.col("words") * 1e6)
        .cast("bigint")
        .alias("diff_q"),
    )
    from hive_processor_spark.functions.orderstat import (
        ntile_expr,
        with_global_order,
    )

    n_all = scored.agg(F.count(F.lit(1)).cast("long").alias("n_all"))
    staged = (
        with_global_order(scored, "diff_q", ["doc_id"], rank="r")
        .crossJoin(F.broadcast(n_all))
        .withColumn("stage", ntile_expr(F.col("r"), F.col("n_all"), 4))
    )
    return (
        staged.groupBy(F.col("stage").cast("int").alias("stage"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("words").cast("bigint").alias("token_budget"),
            F.round(F.min("diff_q") / 1e6, 4).alias("min_difficulty"),
            F.round(F.max("diff_q") / 1e6, 4).alias("max_difficulty"),
        )
        .orderBy("stage")
    )


@register(
    "pipeline_span_corruption",
    """
    WITH toks AS (
        SELECT d.doc_id, t.i AS idx
        FROM (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS w
              FROM documents) d,
        UNNEST(RANGE(1, LEN(d.w) + 1)) AS t(i)
    ), flagged AS (
        SELECT doc_id, idx,
               CASE WHEN (('0x' || SUBSTRING(MD5(CAST(doc_id AS VARCHAR)
                               || ':' || CAST(idx AS VARCHAR)), 1, 15))
                          ::BIGINT) % 10 = 0
                    THEN 1 ELSE 0 END AS st
        FROM toks
    ), masked AS (
        SELECT doc_id, idx, st,
               MAX(st) OVER (PARTITION BY doc_id ORDER BY idx
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS in_mask
        FROM flagged
    ), per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(st) AS BIGINT) AS n_starts,
               CAST(SUM(in_mask) AS BIGINT) AS n_masked
        FROM masked GROUP BY doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_starts) AS BIGINT) AS n_spans,
           CAST(SUM(n_masked) AS BIGINT) AS masked_tokens,
           ROUND(CAST(SUM(n_masked) AS DOUBLE) / SUM(n_tok), 6)
               AS mask_ratio,
           ROUND(CAST(SUM(n_masked) AS DOUBLE)
                 / NULLIF(SUM(n_starts), 0), 6) AS avg_run_len,
           CAST(COUNT(*) FILTER (WHERE n_starts = 0) AS BIGINT)
               AS docs_unmasked
    FROM per_doc
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption planning pass (Raffel et al. '20): each
    token position opens a 3-token mask span with probability 1/10,
    decided by a DETERMINISTIC md5(doc_id:idx) draw (the same
    hash-as-RNG discipline as ``sample_hash_split`` — re-running the
    pipeline masks the same spans, the property that makes corruption
    reproducible across preprocessing reruns). Overlapping spans merge
    via a trailing-3 window MAX of start flags, so masked_tokens
    counts real coverage, not 3×starts; the corpus row reports the
    achieved mask ratio against the 3/10 nominal (overlap pulls it
    down — the test pins the exact combinatorics), the merged-run
    average length and the fully-unmasked doc count that a packing
    step must drop.

    Scale: one token explode (shuffle ∝ tokens) with per-doc windows —
    the same posture as ``text_tokens``; no per-span row fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " ")).alias("i0", "w"),
    ).select("doc_id", (F.col("i0") + 1).alias("idx"))
    h60 = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("idx").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    flagged = toks.select(
        "doc_id",
        "idx",
        F.when(h60 % 10 == 0, 1).otherwise(0).alias("st"),
    )
    w_doc = Window.partitionBy("doc_id").orderBy("idx").rowsBetween(-2, 0)
    masked = flagged.select(
        "doc_id", "st", F.max("st").over(w_doc).alias("in_mask")
    )
    per_doc = masked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.sum("st").cast("long").alias("n_starts"),
        F.sum("in_mask").cast("long").alias("n_masked"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum("n_starts").cast("long").alias("n_spans"),
        F.sum("n_masked").cast("long").alias("masked_tokens"),
        F.round(
            F.sum("n_masked").cast("double") / F.sum("n_tok"), 6
        ).alias("mask_ratio"),
        F.round(
            F.sum("n_masked").cast("double")
            / F.nullif(F.sum("n_starts"), F.lit(0)),
            6,
        ).alias("avg_run_len"),
        F.count(F.when(F.col("n_starts") == 0, 1))
        .cast("long")
        .alias("docs_unmasked"),
    )


@register(
    "pipeline_length_bucketing",
    """
    WITH lens AS (
        SELECT LEN(STRING_SPLIT(TRIM(text), ' ')) AS n
        FROM documents
    ), pol AS (
        SELECT n,
               CAST(POWER(2, CEIL(LN(CAST(n AS DOUBLE)) / LN(2.0)))
                    AS BIGINT) AS pow2,
               (SELECT MAX(n) FROM lens) AS mx
        FROM lens
    )
    SELECT policy, n_docs, true_tokens, padded_tokens,
           ROUND(100.0 * (padded_tokens - true_tokens) / padded_tokens, 4)
               AS waste_pct
    FROM (
        SELECT 'pad_to_max' AS policy,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n) AS BIGINT) AS true_tokens,
               CAST(SUM(mx) AS BIGINT) AS padded_tokens
        FROM pol
        UNION ALL
        SELECT 'pad_to_pow2',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n) AS BIGINT),
               CAST(SUM(pow2) AS BIGINT)
        FROM pol
        UNION ALL
        SELECT 'pack_concat',
               CAST(COUNT(*) AS BIGINT),
               CAST(SUM(n) AS BIGINT),
               CAST(CEIL(SUM(n) / 512.0) * 512 AS BIGINT)
        FROM pol
    )
    ORDER BY policy
    """,
)
def pipeline_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-waste ledger for the three batching policies a trainer
    chooses between: pad every document to the corpus max (the naive
    collate), pad to the next power of two (bucketed batching — what
    dynamic-shape compilers want), and dense sequence packing into
    512-token windows (the ``pipeline_pack_sequences`` regime,
    idealized as ⌈Σn/512⌉ windows). Reported as exact token ledgers
    with waste %, so the table IS the argument for packing: the same
    corpus, three padded footprints. Token counts are whitespace
    lengths (the corpus tokenizer proxy used by
    ``pipeline_tokenize_budget``).

    Scale: one length scan (no explode — LEN of the split array),
    one scalar max broadcast, three aggregate ledgers."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(F.size(F.split(F.trim("text"), " ")).alias("n"))
    mx = lens.agg(F.max("n").alias("mx"))
    pol = lens.crossJoin(F.broadcast(mx)).select(
        "n",
        F.pow(
            F.lit(2.0), F.ceil(F.log(F.col("n").cast("double")) / F.log(F.lit(2.0)))
        )
        .cast("long")
        .alias("pow2"),
        "mx",
    )
    a = pol.agg(
        F.lit("pad_to_max").alias("policy"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("true_tokens"),
        F.sum("mx").cast("long").alias("padded_tokens"),
    )
    b = pol.agg(
        F.lit("pad_to_pow2").alias("policy"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("true_tokens"),
        F.sum("pow2").cast("long").alias("padded_tokens"),
    )
    c = pol.agg(
        F.lit("pack_concat").alias("policy"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("true_tokens"),
        (F.ceil(F.sum("n") / 512.0) * 512).cast("long").alias("padded_tokens"),
    )
    u = a.unionAll(b).unionAll(c)
    return u.select(
        "policy",
        "n_docs",
        "true_tokens",
        "padded_tokens",
        F.round(
            100.0
            * (F.col("padded_tokens") - F.col("true_tokens"))
            / F.col("padded_tokens"),
            4,
        ).alias("waste_pct"),
    ).orderBy("policy")


@register(
    "pipeline_dp_composition",
    """
    WITH base AS (
        SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents
    ), ks AS (
        SELECT UNNEST(RANGE(1, 11)) AS k
    )
    SELECT k.k AS n_releases, b.n_sources,
           ROUND(k.k * 0.5, 4) AS eps_basic,
           ROUND(SQRT(2.0 * k.k * LN(1e6)) * 0.5
                 + k.k * 0.5 * (EXP(0.5) - 1), 4) AS eps_advanced,
           CASE WHEN k.k * 0.5
                     <= SQRT(2.0 * k.k * LN(1e6)) * 0.5
                        + k.k * 0.5 * (EXP(0.5) - 1)
                THEN 'basic' ELSE 'advanced' END AS tighter_bound,
           CASE WHEN k.k <= b.n_sources THEN 1 ELSE 0 END
               AS within_source_budget
    FROM ks k CROSS JOIN base b
    ORDER BY k.k
    """,
)
def pipeline_dp_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy budget ledger for repeated releases of the
    per-source statistics that ``pipeline_dp_noise`` privatizes: for
    k = 1..10 releases at ε₀ = 0.5 each, the basic composition bound
    kε₀ against the advanced bound √(2k ln(1/δ'))·ε₀ + kε₀(e^ε₀−1)
    at δ' = 1e-6 (Dwork–Rothblum–Vadhan '10) — the crossover row
    shows exactly when advanced composition starts paying, which is
    the go/no-go table a release pipeline consults before re-running
    stats on the same corpus. The within_source_budget flag ties the
    schedule to the fixture's actual release unit (one per source).

    Scale: a 10-row generated frame joined to one distinct-count —
    pure policy algebra."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.countDistinct("source").cast("long").alias("n_sources")
    )
    ks = spark.range(1, 11).select(F.col("id").alias("k"))
    eps_basic = F.col("k") * 0.5
    eps_adv = (
        F.sqrt(2.0 * F.col("k") * F.log(F.lit(1e6))) * 0.5
        + F.col("k") * 0.5 * (F.exp(F.lit(0.5)) - 1)
    )
    return (
        ks.crossJoin(F.broadcast(base))
        .select(
            F.col("k").alias("n_releases"),
            "n_sources",
            F.round(eps_basic, 4).alias("eps_basic"),
            F.round(eps_adv, 4).alias("eps_advanced"),
            F.when(eps_basic <= eps_adv, F.lit("basic"))
            .otherwise(F.lit("advanced"))
            .alias("tighter_bound"),
            F.when(F.col("k") <= F.col("n_sources"), 1)
            .otherwise(0)
            .alias("within_source_budget"),
        )
        .orderBy("n_releases")
    )


@register(
    "sample_neyman_allocation",
    """
    WITH s AS (
        SELECT o_orderpriority AS stratum,
               CAST(COUNT(*) AS BIGINT) AS nh,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS sy,
               CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)
                             AS HUGEINT)
                        * CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS HUGEINT) AS syy
        FROM orders GROUP BY 1
    ), m AS (
        SELECT stratum, nh,
               SQRT((CAST(syy AS DOUBLE) / 1e4
                     - (CAST(sy AS DOUBLE) / 100.0)
                       * (CAST(sy AS DOUBLE) / 100.0) / nh)
                    / (nh - 1)) AS sh
        FROM s
    ), tot AS (
        SELECT CAST(SUM(nh) AS BIGINT) AS n_pop,
               SUM(nh * sh) AS wsum
        FROM m
    ), alloc AS (
        SELECT m.stratum, m.nh, m.sh,
               500.0 * m.nh / t.n_pop AS frac_prop,
               500.0 * m.nh * m.sh / t.wsum AS frac_ney
        FROM m CROSS JOIN tot t
    ), rounded AS (
        SELECT stratum, nh, sh,
               CAST(FLOOR(frac_prop) AS BIGINT)
               + CASE WHEN ROW_NUMBER() OVER (
                       ORDER BY frac_prop - FLOOR(frac_prop) DESC, stratum)
                      <= 500 - (SELECT SUM(CAST(FLOOR(frac_prop) AS BIGINT))
                                FROM alloc)
                 THEN 1 ELSE 0 END AS n_prop,
               CAST(FLOOR(frac_ney) AS BIGINT)
               + CASE WHEN ROW_NUMBER() OVER (
                       ORDER BY frac_ney - FLOOR(frac_ney) DESC, stratum)
                      <= 500 - (SELECT SUM(CAST(FLOOR(frac_ney) AS BIGINT))
                                FROM alloc)
                 THEN 1 ELSE 0 END AS n_neyman
        FROM alloc
    )
    SELECT stratum, nh AS stratum_size, ROUND(sh, 4) AS sd_dollars,
           n_prop, n_neyman
    FROM rounded
    ORDER BY stratum
    """,
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman '34) for a
    budget of 500 orders across the five priority strata: nₕ ∝ NₕSₕ
    (big AND volatile strata get more) against the proportional
    baseline nₕ ∝ Nₕ — the design step that precedes
    ``sample_stratified``'s execution, and the reason a revenue-audit
    sample oversamples the urgent strata (their revenue sd is what
    drives estimator variance). Per-stratum moments are exact integer
    cents (squares in 128-bit); both fractional allocations round by
    LARGEST REMAINDER (same discipline as ``agg_largest_remainder``)
    so each column sums to exactly 500 — pinned by the tests.

    Scale: one partial→final aggregate to 5 strata; the ranking
    windows run over 5 rows."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0).cast("long")
    s = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum(cents).cast("long").alias("sy"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("syy"),
    )
    m = s.select(
        "stratum",
        "nh",
        F.sqrt(
            (
                F.col("syy").cast("double") / 1e4
                - (F.col("sy").cast("double") / 100.0)
                * (F.col("sy").cast("double") / 100.0)
                / F.col("nh")
            )
            / (F.col("nh") - 1)
        ).alias("sh"),
    )
    tot = m.agg(
        F.sum("nh").cast("long").alias("n_pop"),
        F.sum(F.col("nh") * F.col("sh")).alias("wsum"),
    )
    alloc = m.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "nh",
        "sh",
        (500.0 * F.col("nh") / F.col("n_pop")).alias("frac_prop"),
        (500.0 * F.col("nh") * F.col("sh") / F.col("wsum")).alias("frac_ney"),
    )
    base = alloc.agg(
        F.sum(F.floor("frac_prop").cast("long")).alias("fp"),
        F.sum(F.floor("frac_ney").cast("long")).alias("fn"),
    )

    def _round(col, basecol):
        w = Window.orderBy(
            F.desc(F.col(col) - F.floor(F.col(col))), F.asc("stratum")
        )
        return F.floor(F.col(col)).cast("long") + F.when(
            F.row_number().over(w) <= 500 - F.col(basecol), 1
        ).otherwise(0)

    rounded = alloc.crossJoin(F.broadcast(base)).select(
        "stratum",
        "nh",
        "sh",
        _round("frac_prop", "fp").alias("n_prop"),
        _round("frac_ney", "fn").alias("n_neyman"),
    )
    return rounded.select(
        "stratum",
        F.col("nh").alias("stratum_size"),
        F.round(F.col("sh"), 4).alias("sd_dollars"),
        "n_prop",
        "n_neyman",
    ).orderBy("stratum")


@register(
    "sample_horvitz_thompson",
    """
    WITH base AS (
        SELECT o_orderkey,
               CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents,
               (('0x' || SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                   ::BIGINT) AS h60
        FROM orders
    ), tot AS (
        SELECT CAST(SUM(cents) AS BIGINT) AS total_c,
               CAST(COUNT(*) AS BIGINT) AS n_pop
        FROM base
    ), pi AS (
        SELECT b.o_orderkey, b.cents, b.h60,
               LEAST(500.0 * b.cents / t.total_c, 1.0) AS p
        FROM base b CROSS JOIN tot t
    ), sampled AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sampled,
               CAST(SUM(CAST(FLOOR(cents / p * 1e2) AS BIGINT)) AS HUGEINT)
                   AS htq
        FROM pi WHERE h60 < CAST(FLOOR(p * 1152921504606846976) AS BIGINT)
    ), ev AS (
        SELECT CAST(SUM(CAST(FLOOR(p * 1e6) AS BIGINT)) AS BIGINT)
                   AS expq
        FROM pi
    )
    SELECT t.n_pop, ROUND(e.expq / 1e6, 2) AS expected_n, s.n_sampled,
           ROUND(t.total_c / 100.0, 2) AS true_total,
           ROUND(s.htq / 1e2 / 100.0, 2) AS ht_estimate,
           ROUND(ABS(s.htq / 1e2 / 100.0 - t.total_c / 100.0)
                 / (t.total_c / 100.0), 6) AS rel_err
    FROM tot t CROSS JOIN sampled s CROSS JOIN ev e
    """,
)
def sample_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz–Thompson total estimator (H–T '52) under
    probability-proportional-to-size sampling with DETERMINISTIC hash
    inclusion: πᵢ = min(1, 500·yᵢ/Y), an order enters the sample iff
    its 60-bit md5 draw falls below ⌊πᵢ·2⁶⁰⌋, and the estimate
    Σ yᵢ/πᵢ is audited against the true total in the same row — the
    unequal-probability machinery behind audit sampling and weighted
    corpus subsampling (``sample_weighted_bottom_k``'s
    estimator-facing cousin; note size-proportional πps makes the
    big-order terms self-weighting, which is why rel_err lands far
    below an SRS of equal size). Inclusion thresholds compare exact
    integers; the weighted terms floor-quantize at 1e-2 cents.

    Scale: two scans (moments, filter) — no shuffle beyond scalar
    reduces; the hash draw makes the 'random' sample reproducible at
    any parallelism."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0).cast("long").alias("cents"),
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15),
            16,
            10,
        )
        .cast("bigint")
        .alias("h60"),
    )
    tot = base.agg(
        F.sum("cents").cast("long").alias("total_c"),
        F.count(F.lit(1)).cast("long").alias("n_pop"),
    )
    pi = base.crossJoin(F.broadcast(tot)).select(
        "cents",
        "h60",
        F.least(500.0 * F.col("cents") / F.col("total_c"), F.lit(1.0)).alias(
            "p"
        ),
    )
    sampled = pi.filter(
        F.col("h60")
        < F.floor(F.col("p") * F.lit(float(1 << 60))).cast("long")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled"),
        F.sum(
            F.floor(F.col("cents") / F.col("p") * 1e2)
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("htq"),
    )
    ev = pi.agg(
        F.sum(F.floor(F.col("p") * 1e6).cast("long"))
        .cast("long")
        .alias("expq")
    )
    return (
        tot.crossJoin(F.broadcast(sampled))
        .crossJoin(F.broadcast(ev))
        .select(
            "n_pop",
            F.round(F.col("expq") / 1e6, 2).alias("expected_n"),
            "n_sampled",
            F.round(F.col("total_c") / 100.0, 2).alias("true_total"),
            F.round(F.col("htq") / 1e2 / 100.0, 2).alias("ht_estimate"),
            F.round(
                F.abs(
                    F.col("htq") / 1e2 / 100.0 - F.col("total_c") / 100.0
                )
                / (F.col("total_c") / 100.0),
                6,
            ).alias("rel_err"),
        )
    )


@register(
    "profile_sample_size_fpc",
    """
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS BIGINT) AS sy,
               CAST(SUM(CAST(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)
                             AS HUGEINT)
                        * CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                    AS HUGEINT) AS syy
        FROM orders
    ), mo AS (
        SELECT n,
               CAST(sy AS DOUBLE) / n / 100.0 AS mean_d,
               SQRT((CAST(syy AS DOUBLE) / 1e4
                     - (CAST(sy AS DOUBLE) / 100.0)
                       * (CAST(sy AS DOUBLE) / 100.0) / n) / (n - 1))
                   AS sd_d
        FROM s
    ), calc AS (
        SELECT n, mean_d, sd_d,
               0.01 * mean_d AS margin,
               (1.96 * sd_d / (0.01 * mean_d))
               * (1.96 * sd_d / (0.01 * mean_d)) AS n0
        FROM mo
    )
    SELECT n AS n_pop,
           ROUND(mean_d, 2) AS mean_dollars,
           ROUND(sd_d, 2) AS sd_dollars,
           ROUND(margin, 4) AS margin_dollars,
           CAST(CEIL(n0) AS BIGINT) AS n_needed_infinite,
           CAST(CEIL(n0 / (1 + (n0 - 1) / n)) AS BIGINT) AS n_needed_fpc,
           ROUND(CEIL(n0 / (1 + (n0 - 1) / n)) / n, 6)
               AS sampling_fraction
    FROM calc
    """,
)
def profile_sample_size_fpc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey sample-size planner with finite-population correction
    (Cochran ch. 4): to estimate mean order value within ±1% at 95%
    confidence, n₀ = (zS/d)² then n = n₀/(1+(n₀−1)/N) — the
    calculation that licenses every "we only audited n of N" claim
    downstream (``sample_estimator_audit`` checks the estimator this
    planner sizes). Moments are exact integer cents (squares in
    128-bit); the two ceilings are pinned integers, not suggestions.

    Scale: one map-side-combined scan; scalar algebra."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100.0).cast("long")
    s = o.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents).cast("long").alias("sy"),
        F.sum(cents.cast("decimal(38,0)") * cents).alias("syy"),
    )
    n = F.col("n")
    mean_d = F.col("sy").cast("double") / n / 100.0
    sd_d = F.sqrt(
        (
            F.col("syy").cast("double") / 1e4
            - (F.col("sy").cast("double") / 100.0)
            * (F.col("sy").cast("double") / 100.0)
            / n
        )
        / (n - 1)
    )
    mo = s.select(n, mean_d.alias("mean_d"), sd_d.alias("sd_d"))
    margin = 0.01 * F.col("mean_d")
    n0 = (1.96 * F.col("sd_d") / margin) * (1.96 * F.col("sd_d") / margin)
    return mo.select(
        n.alias("n_pop"),
        F.round(F.col("mean_d"), 2).alias("mean_dollars"),
        F.round(F.col("sd_d"), 2).alias("sd_dollars"),
        F.round(margin, 4).alias("margin_dollars"),
        F.ceil(n0).cast("long").alias("n_needed_infinite"),
        F.ceil(n0 / (1 + (n0 - 1) / n)).cast("long").alias("n_needed_fpc"),
        F.round(F.ceil(n0 / (1 + (n0 - 1) / n)) / n, 6).alias(
            "sampling_fraction"
        ),
    )


@register(
    "sample_design_effect",
    """
    WITH v AS (
        SELECT c.c_nationkey AS cl,
               CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT) AS y
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ), per AS (
        SELECT cl, CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        FROM v GROUP BY cl
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS g,
               CAST(SUM(m) AS BIGINT) AS n,
               CAST(SUM(sy) AS BIGINT) AS ty,
               CAST(SUM(syy) AS HUGEINT) AS tyy,
               CAST(SUM(m * m) AS BIGINT) AS sm2,
               CAST(SUM(CAST(FLOOR(CAST(sy AS DOUBLE) * sy / m)
                             AS BIGINT)) AS HUGEINT) AS gt_q
        FROM per
    ), an AS (
        SELECT g, n,
               CAST(n AS DOUBLE) / g AS mbar,
               (CAST(gt_q AS DOUBLE)
                - CAST(ty AS DOUBLE) * ty / n) / (g - 1) AS msb,
               (CAST(tyy AS DOUBLE)
                - CAST(gt_q AS DOUBLE)) / (n - g) AS msw
        FROM tot
    ), rho AS (
        SELECT g, n, mbar, msb, msw,
               (msb - msw) / (msb + (mbar - 1) * msw) AS icc
        FROM an
    )
    SELECT g AS n_clusters, n AS n_obs,
           ROUND(mbar, 2) AS avg_cluster_size,
           ROUND(icc, 6) AS icc_rho,
           ROUND(1 + (mbar - 1) * icc, 4) AS design_effect,
           ROUND(CAST(n AS DOUBLE) / (1 + (mbar - 1) * icc), 1)
               AS effective_sample_size
    FROM rho
    """,
)
def sample_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey design effect for cluster sampling by customer NATION
    (Kish '65): DEFF = 1 + (m̄−1)ρ with ρ the intraclass correlation
    of order value within nation — if orders cluster by nation,
    sampling whole nations buys you far fewer EFFECTIVE observations
    than raw rows (n_eff = n/DEFF, published), which is the number
    every two-stage sampling plan must divide by before quoting
    precision (closes the survey family: ``sample_neyman_allocation``
    sizes strata, ``profile_sample_size_fpc`` sizes n, this corrects
    n for clustering; ICC machinery shared with
    ``stats_icc_oneway``). Moments are exact integers, the one
    rational Σ(Σy)²/m floored to whole cents² (its scale is ~1e17,
    so unit flooring is 17 significant digits).

    Scale: one partial→final aggregate to 25 nation cells."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    v = o.join(c, c.c_custkey == o.o_custkey).select(
        F.col("c_nationkey").alias("cl"),
        F.floor(F.col("o_totalprice") * 100.0).cast("long").alias("y"),
    )
    per = v.groupBy("cl").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("g"),
        F.sum("m").cast("long").alias("n"),
        F.sum("sy").cast("long").alias("ty"),
        F.sum("syy").alias("tyy"),
        F.sum(F.col("m") * F.col("m")).cast("long").alias("sm2"),
        F.sum(
            F.floor(
                F.col("sy").cast("double") * F.col("sy") / F.col("m")
            )
            .cast("long")
            .cast("decimal(38,0)")
        ).alias("gt_q"),
    )
    g, n = F.col("g"), F.col("n")
    mbar = n.cast("double") / g
    msb = (
        F.col("gt_q").cast("double")
        - F.col("ty").cast("double") * F.col("ty") / n
    ) / (g - 1)
    msw = (
        F.col("tyy").cast("double") - F.col("gt_q").cast("double")
    ) / (n - g)
    icc = (msb - msw) / (msb + (mbar - 1) * msw)
    deff = 1 + (mbar - 1) * icc
    return tot.select(
        g.alias("n_clusters"),
        n.alias("n_obs"),
        F.round(mbar, 2).alias("avg_cluster_size"),
        F.round(icc, 6).alias("icc_rho"),
        F.round(deff, 4).alias("design_effect"),
        F.round(n.cast("double") / deff, 1).alias("effective_sample_size"),
    )


@register(
    "pipeline_dsir_weights",
    """
    WITH toks AS (
        SELECT doc_id, source, lang, STRING_SPLIT(text, ' ') AS w
        FROM documents
    ), bg AS (
        SELECT doc_id, source, lang,
               UNNEST([ARRAY_TO_STRING(w[i:i+1], ' ')
                       FOR i IN RANGE(1, LEN(w))]) AS bg
        FROM toks
    ), hashed AS (
        SELECT doc_id, source, lang,
               (('0x' || SUBSTRING(MD5(bg), 1, 4))::BIGINT) % 256 AS b
        FROM bg
    ), feat AS (
        SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM hashed GROUP BY 1, 2, 3
    ), rawb AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM hashed GROUP BY b
    ), tgtb AS (
        SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM hashed
        WHERE lang = 'en' GROUP BY b
    ), tots AS (
        SELECT (SELECT SUM(c) FROM rawb) AS rt,
               (SELECT SUM(c) FROM tgtb) AS tt
    ), lam AS (
        SELECT r.b,
               LN((COALESCE(t.c, 0) + 1.0) / (tt + 256.0))
               - LN((r.c + 1.0) / (rt + 256.0)) AS lam
        FROM rawb r LEFT JOIN tgtb t ON r.b = t.b, tots
    ), docw AS (
        SELECT f.doc_id, f.source,
               CAST(SUM(CAST(FLOOR(f.c * l.lam * 1e6) AS BIGINT))
                    AS BIGINT) AS q
        FROM feat f JOIN lam l ON f.b = l.b
        GROUP BY 1, 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(q) AS DOUBLE) / 1e6 / COUNT(*), 6)
               AS avg_weight,
           ROUND(CAST(COUNT(*) FILTER (WHERE q > 0) AS DOUBLE)
                 / COUNT(*), 4) AS pct_toward_target
    FROM docw GROUP BY source ORDER BY source
    """,
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. '23, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its HASHED-BIGRAM profile is —
    w(d) = Σ_b c_db·[ln p̂_target(b) − ln p̂_raw(b)] over 256 hash
    buckets, Laplace-smoothed, with the English sub-corpus as the
    target distribution. Positive weight ⇒ resampling would pull the
    doc in; the per-source report is the mixture diagnostic read before
    sampling (which ``pipeline_rejection_sample`` /
    ``pipeline_mixture_weights`` then execute). Bucket ids come from the
    engine-shared MD5 path (exact on both engines); per-(doc,bucket)
    counts are exact integers and the per-doc fold is floor-quantized at
    1e-6, so weights hash-match at any parallelism.

    Scale: two grouped counts over the exploded bigram stream (map-side
    combined), a 256-row broadcast of the log-ratio table, one grouped
    fold per doc — the hashed feature space is CONSTANT-width no matter
    the corpus, which is the entire DSIR trick."""
    docs = load_table(spark, sf_dir, "documents")
    bigrams = F.expr(
        ngram_join(2)
    )
    hashed = (
        docs.select(
            "doc_id", "source", "lang", F.split("text", " ").alias("w")
        )
        .select(
            "doc_id", "source", "lang", F.explode(bigrams).alias("bg")
        )
        .select(
            "doc_id",
            "source",
            "lang",
            (
                F.conv(F.substring(F.md5("bg"), 1, 4), 16, 10).cast("long")
                % 256
            ).alias("b"),
        )
    )
    feat = hashed.groupBy("doc_id", "source", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rawb = hashed.groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("rc")
    )
    tgtb = (
        hashed.filter(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
    )
    tots = rawb.crossJoin(tgtb.agg(F.sum("tc").alias("tt"))).agg(
        F.sum("rc").alias("rt"), F.max("tt").alias("tt")
    )
    lam = (
        rawb.join(F.broadcast(tgtb), "b", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1.0)
                    / (F.col("tt") + 256.0)
                )
                - F.log((F.col("rc") + 1.0) / (F.col("rt") + 256.0))
            ).alias("lam"),
        )
    )
    docw = (
        feat.join(F.broadcast(lam), "b")
        .groupBy("doc_id", "source")
        .agg(
            F.sum(F.floor(F.col("c") * F.col("lam") * 1e6).cast("long"))
            .cast("long")
            .alias("q")
        )
    )
    return (
        docw.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum("q").cast("double") / 1e6 / F.count(F.lit(1)), 6
            ).alias("avg_weight"),
            F.round(
                F.count_if(F.col("q") > 0).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("pct_toward_target"),
        )
        .orderBy("source")
    )


@register(
    "text_watermark_greenlist",
    """
    WITH toks AS (
        SELECT doc_id, source, STRING_SPLIT(text, ' ') AS w
        FROM documents
    ), trans AS (
        SELECT doc_id, source,
               UNNEST([w[i] || '|' || w[i+1]
                       FOR i IN RANGE(1, LEN(w))]) AS pair
        FROM toks
    ), scored AS (
        SELECT doc_id, source,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (
                   WHERE (('0x' || SUBSTRING(MD5(pair), 1, 8))::BIGINT)
                         % 2 = 0) AS BIGINT) AS g
        FROM trans GROUP BY 1, 2
    ), z AS (
        SELECT source,
               (2.0 * g - n) / SQRT(CAST(n AS DOUBLE)) AS z
        FROM scored WHERE n >= 10
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(FLOOR(z * 1e6) AS BIGINT)) AS DOUBLE)
                 / 1e6 / COUNT(*), 4) AS mean_z,
           ROUND(MAX(z), 4) AS max_z,
           CAST(COUNT(*) FILTER (WHERE z > 2.0) AS BIGINT) AS n_flagged
    FROM z GROUP BY source ORDER BY source
    """,
)
def text_watermark_greenlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenlist watermark detector (Kirchenbauer et al. '23, "A
    Watermark for Large Language Models"): with γ=½, each token is
    "green" iff a hash seeded by its PREDECESSOR lands even — watermarked
    generations oversample green tokens, so z = (2g−n)/√n ~ N(0,1) on
    clean text and blows past 2 on marked text. Scored per document
    (n ≥ 10 transitions), reported per source: mean z, max z, and the
    flag count — the provenance audit a training-data pipeline runs to
    keep synthetic (watermarked) text out of the corpus. The fixture
    corpus is clean, so mean_z ≈ 0 IS the correct answer; the machinery
    (bigram hash transitions, per-doc z, source rollup) is what's under
    test. Hash from the engine-shared MD5 path; the per-source mean
    folds floor-quantized z at 1e-6.

    Scale: one exploded-transition grouped count per doc (map-side
    combined), then a metadata-sized source rollup — linear in corpus
    size, no joins."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = F.expr(
        guarded_fanout(
            1, "concat(element_at(w, i), '|', element_at(w, i + 1))"
        )
    )
    trans = docs.select(
        "doc_id", "source", F.split("text", " ").alias("w")
    ).select("doc_id", "source", F.explode(pairs).alias("pair"))
    green = (
        F.conv(F.substring(F.md5("pair"), 1, 8), 16, 10).cast("long") % 2
        == 0
    )
    scored = trans.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count_if(green).cast("long").alias("g"),
    )
    z = scored.filter(F.col("n") >= 10).select(
        "source",
        (
            (2.0 * F.col("g") - F.col("n"))
            / F.sqrt(F.col("n").cast("double"))
        ).alias("z"),
    )
    return (
        z.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.floor(F.col("z") * 1e6).cast("long")).cast(
                    "double"
                )
                / 1e6
                / F.count(F.lit(1)),
                4,
            ).alias("mean_z"),
            F.round(F.max("z"), 4).alias("max_z"),
            F.count_if(F.col("z") > 2.0).cast("long").alias("n_flagged"),
        )
        .orderBy("source")
    )


def _ppl_buckets_sql() -> str:
    from hive_processor_spark.operators.textops import _BIGRAM_PPL_SQL

    return f"""
    WITH b AS ({_BIGRAM_PPL_SQL}),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM b),
    ranked AS (
        SELECT b.doc_id, b.n_bigrams, b.avg_bits,
               ROW_NUMBER() OVER (ORDER BY b.avg_bits, b.doc_id) AS rn
        FROM b
    ),
    cuts AS (
        SELECT MAX(CASE WHEN rn <= CAST(CEIL(n / 3.0) AS BIGINT)
                        THEN avg_bits END) AS t1,
               MAX(CASE WHEN rn <= CAST(CEIL(2.0 * n / 3.0) AS BIGINT)
                        THEN avg_bits END) AS t2
        FROM ranked, nn
    ),
    tagged AS (
        SELECT CASE WHEN avg_bits <= t1 THEN 'head'
                    WHEN avg_bits <= t2 THEN 'middle'
                    ELSE 'tail' END AS bucket,
               n_bigrams,
               CAST(FLOOR(avg_bits * 1000000.0 + 0.5) AS BIGINT) AS micro
        FROM ranked, cuts
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_bigrams) AS BIGINT) AS n_bigrams,
           FLOOR(CAST(SUM(micro) AS DOUBLE) / COUNT(*)) / 1000000.0
               AS mean_bits
    FROM tagged GROUP BY bucket ORDER BY bucket
    """


@register("pipeline_perplexity_buckets", _ppl_buckets_sql())
def pipeline_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. '20): split the
    corpus into head/middle/tail TERCILES by language-model perplexity
    (here the interpolated bigram model of ``text_bigram_perplexity``;
    a production recipe swaps in KenLM behind the identical shape) and
    report each bucket's document count, bigram mass and mean bits —
    the table a curation run reads before deciding to keep head+middle
    and drop tail, the single most load-bearing quality decision in the
    CCNet/RedPajama lineage.

    Tercile cutoffs are exact order statistics taken WITHOUT a global
    sort OR a top-k funnel (round-9, ADVICE r8): the k-th smallest
    avg_bits VALUE depends only on the value multiset, so both cutoffs
    come from the shared bucket-walk + targeted-probe machinery
    (``grouped_order_statistics``) over the per-value histogram — one
    scan answers both terciles, the covering buckets' slices are the
    only rows ever sorted, and nothing reaches the driver (the previous
    ``orderBy … limit k`` probes routed up to ⌈2n/3⌉ rows through one
    top-k task each). Bucket assignment is VALUE-based (avg_bits ≤
    cutoff), so ties land identically on both engines regardless of
    partitioning; the final rollup also runs on the histogram (counts,
    bigram mass and the µ-bit sums are all value-group linear)."""
    from hive_processor_spark.functions.orderstat import (
        grouped_order_statistics,
    )
    from hive_processor_spark.operators.textops import bigram_ppl_pinned

    # Per-VALUE histogram of the scored corpus. The scored frame is the
    # SESSION PIN shared with ``text_bigram_perplexity`` (round-10): its
    # lineage carries the whole bigram-scoring join tree (~1.1 s/scan at
    # sf0.1), so the cutoff walk's 3 scans and the final rollup re-read
    # a cached |docs|-row frame instead of re-deriving the model — the
    # per-run eager localCheckpoint this replaces paid one extra
    # materialization barrier on top.
    hist = (
        bigram_ppl_pinned(spark, sf_dir)
        .groupBy("avg_bits")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("n_bigrams").cast("long").alias("snb"),
        )
        .select(F.lit(1).alias("g"), "avg_bits", "c", "snb")
    )
    cuts = grouped_order_statistics(
        hist,
        "g",
        "avg_bits",
        "c",
        {
            "t1": lambda n: F.ceil(n / F.lit(3.0)),
            "t2": lambda n: F.ceil(F.lit(2.0) * n / F.lit(3.0)),
        },
    ).select("g", "t1", "t2")
    bucket = (
        F.when(F.col("avg_bits") <= F.col("t1"), "head")
        .when(F.col("avg_bits") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    micro = F.floor(F.col("avg_bits") * 1000000.0 + 0.5).cast("long")
    return (
        hist.join(F.broadcast(cuts), "g")
        .select(bucket.alias("bucket"), "c", "snb", micro.alias("micro"))
        .groupBy("bucket")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.sum("snb").cast("long").alias("n_bigrams"),
            (
                F.floor(
                    F.sum(F.col("micro") * F.col("c")).cast("double")
                    / F.sum("c")
                )
                / 1000000.0
            ).alias("mean_bits"),
        )
        .orderBy("bucket")
    )
