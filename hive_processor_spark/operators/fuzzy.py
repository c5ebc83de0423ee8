"""Fuzzy string matching — edit-distance operators (SURVEY.md §2 extension).

The one string-similarity surface the registry lacked: Levenshtein scalar
distance (with the bounded-threshold early-exit variant), blocked fuzzy
near-dup pair generation over a name vocabulary, and min-distance entity
resolution against a canonical dimension — the three shapes entity
resolution / fuzzy dedup pipelines actually run. Dispatched through the
registry surface the reference exposes via ``Processor.call``
(reference ``src/processor.ts:57-89``).

Scale shape: edit distance is O(len²) per pair, so the discipline is
(1) compute on the DISTINCT vocabulary, never per row — vocabulary
cardinality, not corpus size, drives cost (64 names here; a 100 TB corpus
has maybe 10⁶ distinct product names); (2) generate candidates by
BLOCKING (shared token), never all-pairs — the same candidate-then-verify
shape as dedup_ngram_verify; (3) bound the scan with the threshold
variant, which abandons a pair once the distance provably exceeds k
(Spark's 3-arg ``levenshtein`` returns -1 past the threshold — the
banded-DP optimization, O(k·len) instead of O(len²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_processor_spark.engine import register
from hive_processor_spark.sources.tables import load_table


@register(
    "fn_levenshtein",
    """
    SELECT p_name,
           CAST(levenshtein(p_name, 'small ring') AS INT) AS dist_ref,
           CAST(CASE WHEN levenshtein(p_name, 'small ring') > 3 THEN -1
                     ELSE levenshtein(p_name, 'small ring') END AS INT)
               AS dist_ref_capped,
           ROUND(1.0 - CAST(levenshtein(p_name, 'small ring') AS DOUBLE)
                     / GREATEST(LENGTH(p_name), LENGTH('small ring')), 4)
               AS sim_norm
    FROM (SELECT DISTINCT p_name FROM part)
    ORDER BY p_name
    """,
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein scalar surface over the distinct name vocabulary:
    exact distance to a reference string, the THRESHOLD variant (-1 once
    the distance provably exceeds 3 — Spark's banded DP stops early, the
    form to use in million-name blocking joins), and the normalized
    similarity ``1 − dist/max_len`` every fuzzy-match ranker uses.
    Distinct-first: the distance runs 64 times, not 2000 — at 100 TB the
    distinct aggregation is the only row-proportional cost."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    ref = F.lit("small ring")
    dist = F.levenshtein("p_name", ref)
    return names.select(
        "p_name",
        dist.cast("int").alias("dist_ref"),
        F.levenshtein("p_name", ref, 3).cast("int").alias("dist_ref_capped"),
        F.round(
            1.0
            - dist.cast("double")
            / F.greatest(F.length("p_name"), F.length(ref)),
            4,
        ).alias("sim_norm"),
    ).orderBy("p_name")


@register(
    "dedup_fuzzy_names",
    """
    WITH vocab AS (
        SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM part GROUP BY p_name
    ), toks AS (
        SELECT name, n_rows,
               split_part(name, ' ', 1) AS adj,
               split_part(name, ' ', 2) AS noun
        FROM vocab
    ), cand AS (
        SELECT a.name AS name_a, b.name AS name_b,
               a.n_rows AS rows_a, b.n_rows AS rows_b
        FROM toks a JOIN toks b
          ON a.noun = b.noun AND a.name < b.name
        UNION
        SELECT a.name, b.name, a.n_rows, b.n_rows
        FROM toks a JOIN toks b
          ON a.adj = b.adj AND a.name < b.name
    )
    SELECT name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS dist,
           rows_a, rows_b
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 3
    ORDER BY dist, name_a, name_b
    """,
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy near-dup pairs over the name vocabulary: candidates
    share a token (same noun OR same adjective — two blocking keys,
    union-deduped), verified with exact Levenshtein ≤ 3, and each
    surviving pair carries the row counts it would merge. The standard
    entity-resolution candidate-then-verify shape: blocking bounds
    candidates at Σ block² over token groups instead of |vocab|²
    all-pairs, and recall is the documented tradeoff (a pair sharing NO
    token is assumed unreachable within the threshold — for two-token
    names a miss needs both tokens to drift yet stay ≤ 3 total edits).
    At 100 TB both joins shuffle on the token key and the vocabulary is
    the distinct aggregate, so cost tracks vocabulary size, not rows."""
    vocab = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_name").alias("name"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    toks = vocab.select(
        "name",
        "n_rows",
        F.split_part(F.col("name"), F.lit(" "), F.lit(1)).alias("adj"),
        F.split_part(F.col("name"), F.lit(" "), F.lit(2)).alias("noun"),
    )
    a = toks.select(
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("rows_a"),
        "adj",
        "noun",
    )
    b = toks.select(
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("rows_b"),
        F.col("adj").alias("adj_b"),
        F.col("noun").alias("noun_b"),
    )
    by_noun = a.join(
        b, (F.col("noun") == F.col("noun_b")) & (F.col("name_a") < F.col("name_b"))
    ).select("name_a", "name_b", "rows_a", "rows_b")
    by_adj = a.join(
        b, (F.col("adj") == F.col("adj_b")) & (F.col("name_a") < F.col("name_b"))
    ).select("name_a", "name_b", "rows_a", "rows_b")
    cand = by_noun.union(by_adj).distinct()
    dist = F.levenshtein("name_a", "name_b")
    return (
        cand.withColumn("dist", dist.cast("int"))
        .filter(F.col("dist") <= 3)
        .select("name_a", "name_b", "dist", "rows_a", "rows_b")
        .orderBy("dist", "name_a", "name_b")
    )


@register(
    "text_fuzzy_lookup",
    """
    WITH dirty AS (
        SELECT DISTINCT LOWER(REPLACE(n_name, '_', ' ')) AS raw_name
        FROM nation
    ), canon AS (
        SELECT n_nationkey, n_name FROM nation
    ), scored AS (
        SELECT d.raw_name, c.n_nationkey, c.n_name,
               CAST(levenshtein(d.raw_name, c.n_name) AS INT) AS dist,
               ROW_NUMBER() OVER (
                   PARTITION BY d.raw_name
                   ORDER BY levenshtein(d.raw_name, c.n_name), c.n_name
               ) AS rn
        FROM dirty d CROSS JOIN canon c
    )
    SELECT raw_name, CAST(n_nationkey AS INT) AS resolved_key,
           n_name AS resolved_name, dist
    FROM scored WHERE rn = 1
    ORDER BY raw_name
    """,
)
def text_fuzzy_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-edit-distance entity resolution against a canonical dimension:
    'dirty' inputs (lowercased, underscores spaced — the mangling feeds
    and scrapes actually produce) each resolve to the canonical nation
    with the smallest Levenshtein distance, deterministic tie-break on
    name. The dirty side stays distinct-deduped and the CANONICAL side
    broadcasts (dimensions are small by definition), so the resolution is
    a map-only broadcast nested-loop + per-key window top-1 — no shuffle
    of the corpus; at 100 TB this is the same plan with the dirty
    vocabulary as the only large side."""
    nation = load_table(spark, sf_dir, "nation")
    dirty = nation.select(
        F.lower(F.replace(F.col("n_name"), F.lit("_"), F.lit(" "))).alias(
            "raw_name"
        )
    ).distinct()
    canon = nation.select("n_nationkey", "n_name")
    from pyspark.sql import Window

    w = Window.partitionBy("raw_name").orderBy(
        F.levenshtein("raw_name", "n_name"), F.col("n_name")
    )
    return (
        dirty.crossJoin(F.broadcast(canon))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "raw_name",
            F.col("n_nationkey").cast("int").alias("resolved_key"),
            F.col("n_name").alias("resolved_name"),
            F.levenshtein("raw_name", "n_name").cast("int").alias("dist"),
        )
        .orderBy("raw_name")
    )


@register(
    "fn_trigram_similarity",
    """
    WITH t AS (
        SELECT p_partkey, p_brand,
               LIST_DISTINCT(LIST_TRANSFORM(
                   RANGE(1, LEN(LOWER(p_name)) - 1),
                   i -> LOWER(p_name)[i:i+2])) AS tg
        FROM part
    ), pref AS (
        SELECT p_partkey, p_brand,
               LIST_SORT(LIST_TRANSFORM(tg,
                   s -> ('0x' || SUBSTRING(MD5(s), 1, 15))::BIGINT))
               [1 : LEN(tg) - CAST(CEIL(LEN(tg) * 0.8) AS INT) + 1] AS ph
        FROM t
    ), inv AS (
        SELECT p_partkey, p_brand, UNNEST(ph) AS h FROM pref
    ), cand AS (
        SELECT DISTINCT a.p_partkey AS part_a, b.p_partkey AS part_b,
               a.p_brand
        FROM inv a JOIN inv b
          ON a.p_brand = b.p_brand AND a.h = b.h
             AND a.p_partkey < b.p_partkey
    )
    SELECT c.part_a, c.part_b, c.p_brand,
           CAST(LEN(LIST_INTERSECT(a.tg, b.tg)) AS BIGINT) AS n_shared,
           ROUND(CAST(LEN(LIST_INTERSECT(a.tg, b.tg)) AS DOUBLE)
                 / (LEN(a.tg) + LEN(b.tg) - LEN(LIST_INTERSECT(a.tg, b.tg))),
                 6) AS trigram_sim
    FROM cand c
    JOIN t a ON a.p_partkey = c.part_a
    JOIN t b ON b.p_partkey = c.part_b
    WHERE CAST(LEN(LIST_INTERSECT(a.tg, b.tg)) AS DOUBLE)
          / (LEN(a.tg) + LEN(b.tg) - LEN(LIST_INTERSECT(a.tg, b.tg))) >= 0.8
    ORDER BY trigram_sim DESC, part_a, part_b
    LIMIT 20
    """,
)
def fn_trigram_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pg_trgm-style character-trigram Jaccard similarity between part
    names, blocked by brand — the third fuzzy-matching lane beside the
    registered Levenshtein pair (edit distance = typo-shaped errors;
    trigram sets = word-order / substring-shaped matches, and cheaper:
    set intersection beats O(mn) DP). Emits the top-20 near-identical
    name pairs ≥ 0.8 with the rounded score (integer set sizes make the
    ranking exact).

    Scale posture — CLONE COLLAPSE first, then a lossless PPJoin
    (Xiao et al. '08, the ``dedup_ngram_verify`` machinery) over the
    collapsed NAME VOCABULARY, never the corpus:

    1. Trigram sets, the prefix index, the candidate join, and the
       array_intersect verify all run once per distinct lowercase name
       (64 at sf0.1, vs 20 000 part rows / 1.4 M row-level candidate
       collisions the pre-round-6 row-level form generated). Vocabulary
       cardinality, not corpus size, drives the quadratic stage — a
       100 TB catalog has ~10⁶ distinct names, and the prefix filter
       (first |X| − ⌈0.8·|X|⌉ + 1 trigrams in global hash order; the
       min-common-element argument makes recall exact BY CONSTRUCTION,
       property-tested in tests/test_properties.py) bounds candidates
       at that vocabulary scale.
    2. Qualifying name pairs (plus identical-name self-pairs, Jaccard 1
       by definition) expand back to part-key pairs through the
       (brand, name) clone-group table: one corpus shuffle to build the
       groups, then a broadcast of the VOCABULARY-BOUND sim table (name
       pairs ≥ 0.8 — tiny at any scale) and a group×group key expansion
       whose output is exactly the qualifying pairs (156 K at sf0.1),
       fed straight into TakeOrderedAndProject(20). Every broadcast here
       is bounded by the name vocabulary, not the corpus (ADVICE r5 #1:
       the old form broadcast the full tokenized part table, which grows
       with scale factor)."""
    part = load_table(spark, sf_dir, "part")
    # clone collapse: the trigram machinery sees one row per distinct
    # lowercase name — the expensive tokenize/hash/verify work is
    # vocabulary-sized
    names = part.select(F.lower(F.col("p_name")).alias("name")).distinct()
    tg = F.array_distinct(
        F.expr(
            "transform(sequence(1, length(name) - 2), "
            "i -> substring(name, i, 3))"
        )
    )
    t = names.select("name", tg.alias("tg"))
    # canonical order note: PPJoin's rarity (ascending-df) ordering was
    # measured here and REJECTED in round 5 — this fixture's names draw
    # on a tiny token vocabulary, so "rare" trigrams still collide while
    # the df join + per-name reorder adds a shuffle that costs more than
    # the halved verify saves. Hash order keeps the one-pass prefix;
    # recall is lossless under any global total order.
    hashes = F.array_sort(
        F.expr(
            "transform(tg, s -> cast(conv(substring(md5(s), 1, 15), 16, 10)"
            " as bigint))"
        )
    )
    prefix_len = (
        F.size("tg") - F.ceil(F.size("tg") * F.lit(0.8)).cast("int") + 1
    )
    inv = t.select(
        "name",
        F.size("tg").alias("sz"),
        F.explode(F.slice(hashes, F.lit(1), prefix_len)).alias("h"),
    )
    a = inv.select(F.col("name").alias("name_a"), "h", "sz")
    b = inv.select(
        F.col("name").alias("name_b"),
        F.col("h").alias("h_b"),
        F.col("sz").alias("sz_b"),
    )
    # PPJoin length filter: J >= 0.8 forces |A∩B| >= 0.8·max(|A|,|B|)
    # and |A∩B| <= min(|A|,|B|), so min >= 0.8·max — exact in integers
    # as 5·least >= 4·greatest, applied inside the candidate join.
    len_ok = (
        F.least(F.col("sz"), F.col("sz_b")) * 5
        >= F.greatest(F.col("sz"), F.col("sz_b")) * 4
    )
    cand = (
        a.join(
            b,
            (F.col("h") == F.col("h_b"))
            & (F.col("name_a") < F.col("name_b"))
            & len_ok,
        )
        .select("name_a", "name_b")
        .distinct()
    )
    ta = t.select(F.col("name").alias("name_a"), F.col("tg").alias("ta"))
    tb = t.select(F.col("name").alias("name_b"), F.col("tg").alias("tb"))
    inter = F.size(F.array_intersect(F.col("ta"), F.col("tb")))
    union = F.size("ta") + F.size("tb") - inter
    sim = inter.cast("double") / union
    # verify over name pairs only (vocabulary² worst case, prefix-pruned)
    cross_sims = (
        cand.join(F.broadcast(ta), "name_a")
        .join(F.broadcast(tb), "name_b")
        .filter(sim >= 0.8)
        .select(
            "name_a",
            "name_b",
            inter.cast("bigint").alias("n_shared"),
            F.round(sim, 6).alias("trigram_sim"),
        )
    )
    # identical names: Jaccard 1 by definition, never verified
    self_sims = t.select(
        F.col("name").alias("name_a"),
        F.col("name").alias("name_b"),
        F.size("tg").cast("bigint").alias("n_shared"),
        F.lit(1.0).alias("trigram_sim"),
    )
    sims = cross_sims.unionAll(self_sims)
    # clone groups: one corpus shuffle; key arrays are clone-group-sized
    groups = (
        part.groupBy(
            "p_brand", F.lower(F.col("p_name")).alias("name")
        ).agg(F.sort_array(F.collect_list("p_partkey")).alias("keys"))
    )
    ga = groups.select(
        "p_brand", F.col("name").alias("name_a"), F.col("keys").alias("ka")
    )
    gb = groups.select(
        F.col("p_brand").alias("brand_b"),
        F.col("name").alias("nb"),
        F.col("keys").alias("kb"),
    )
    # expand each qualifying (brand, name_a, name_b) group pair into its
    # part-key pairs: within-group pairs need x < y; cross-name pairs are
    # all combinations canonicalized to (least, greatest)
    exp = (
        ga.join(F.broadcast(sims), "name_a")
        .join(
            gb,
            (F.col("name_b") == F.col("nb"))
            & (F.col("p_brand") == F.col("brand_b")),
        )
        .drop("nb", "brand_b")
        .select(
            "p_brand",
            "n_shared",
            "trigram_sim",
            (F.col("name_a") == F.col("name_b")).alias("same"),
            F.explode("ka").alias("x"),
            F.col("kb"),
        )
        .select(
            "p_brand",
            "n_shared",
            "trigram_sim",
            "same",
            "x",
            F.explode("kb").alias("y"),
        )
        .filter(~F.col("same") | (F.col("x") < F.col("y")))
    )
    return (
        exp.select(
            F.least("x", "y").alias("part_a"),
            F.greatest("x", "y").alias("part_b"),
            "p_brand",
            "n_shared",
            "trigram_sim",
        )
        .orderBy(F.desc("trigram_sim"), "part_a", "part_b")
        .limit(20)
    )
