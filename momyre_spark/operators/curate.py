"""End-to-end training-corpus curation: the composed LLM-data pipeline.

One operator chaining the canonical stages a 100 TB text corpus goes
through before training:

    1. quality gate      : length + quality-score thresholds (map-only)
    2. language filter   : keep target languages (map-only)
    3. exact dedup       : normalization-fingerprint groupBy, min-id survives
    4. near-dup removal  : MinHash+LSH candidate pairs -> exact verify ->
                           connected components -> only each duplicate
                           cluster's min-id survives

Stage order matters at scale: the map-only gates run first so the shuffling
stages (3, 4) see the smallest possible corpus. Everything is lazy — one
action executes the whole pipeline; stages 1-2 fuse into the parquet scan's
WholeStageCodegen.

Returns (curated_df, report_df) where report_df is a tiny per-stage
row-count audit (evaluated on demand) — pipelines that silently drop data
are the mortal sin of corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from momyre_spark.functions.text import quality_score, token_count
from momyre_spark.operators.dedup import (
    dedup_exact,
    duplicate_components,
    minhash_lsh_pairs,
)


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    min_quality: float = 0.3,
    languages: tuple[str, ...] | None = None,
    neardup_threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> tuple[DataFrame, DataFrame]:
    t = F.col(text_col)

    from pyspark import StorageLevel

    gated = docs.filter(
        (token_count(t) >= min_tokens) & (quality_score(t) >= min_quality)
    )
    if languages is not None:
        gated = gated.filter(F.col(lang_col).isin(*languages))

    # ``exact`` feeds three consumers (LSH pairs, the curated anti-join, the
    # report) and ``curated`` two (return value, report) — persisted so
    # consuming BOTH outputs runs the dedup/LSH stages once, not per
    # consumer (MEMORY_AND_DISK: spills, never OOMs; evicted lazily).
    exact = dedup_exact(gated, id_col=id_col, text_col=text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    pairs = minhash_lsh_pairs(
        exact, threshold=neardup_threshold, id_col=id_col, text_col=text_col
    )
    comps = duplicate_components(pairs)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    curated = exact.join(losers, id_col, "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    report = (
        docs.select(F.lit("input").alias("stage"), F.lit(0).alias("ord"), F.col(id_col))
        .unionByName(gated.select(F.lit("quality_lang_gate").alias("stage"),
                                  F.lit(1).alias("ord"), F.col(id_col)))
        .unionByName(exact.select(F.lit("exact_dedup").alias("stage"),
                                  F.lit(2).alias("ord"), F.col(id_col)))
        .unionByName(curated.select(F.lit("neardup_removed").alias("stage"),
                                    F.lit(3).alias("ord"), F.col(id_col)))
        .groupBy("stage", "ord")
        .agg(F.count(F.lit(1)).alias("docs"))
        .orderBy("ord")
        .select("stage", "docs")
    )
    return curated, report


# The Gopher/MassiveText rule set's stopword probe (Rae et al. 2021,
# published rules): a document passes if >= min_stop_hits DISTINCT members
# of this list occur (occurrence counts don't matter — "the the the" is 1).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_gates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document-quality RULE gates (the published MassiveText
    repetition-free subset): word-count bounds, mean word length band,
    symbol-to-word ratio, bullet/ellipsis line fractions, alphabetic-word
    fraction, and the stop-word probe. One per-gate boolean column plus the
    conjunction (``passes``) per document.

    Everything is a higher-order-function expression over ONE tokenize —
    no explode, no UDF, no shuffle: the whole gate battery fuses into the
    scan's WholeStageCodegen, so at 100 TB it runs at IO speed as the first
    stage of curation (cheapest filter first, like curate_corpus stage 1).
    All folds are sequential doubles, so a DuckDB oracle reproduces every
    boolean bit-for-bit."""
    from momyre_spark.functions.text import tokens

    t = F.col(text_col)
    toks = tokens(t)
    n = F.size(toks).cast("double")
    lines = F.split(t, "\n")
    nl = F.size(lines).cast("double")

    mean_wl = (
        F.aggregate(toks, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n
    )
    frac = lambda arr, pred, denom: (  # noqa: E731
        F.size(F.filter(arr, pred)).cast("double") / denom
    )
    symbol_ratio = frac(toks, lambda x: x.rlike(r"#|\.\.\.|…"), n)
    bullet_frac = frac(lines, lambda line: line.rlike(r"^\s*[-*•]"), nl)
    ellipsis_frac = frac(
        lines, lambda line: line.rlike(r"(\.\.\.|…)\s*$"), nl
    )
    alpha_frac = frac(toks, lambda x: x.rlike("[A-Za-z]"), n)
    # DISTINCT stop words, not occurrences: the published MassiveText rule
    # requires >= 2 DIFFERENT stop words, so "the the the ..." must fail.
    stop_hits = F.size(
        F.array_distinct(
            F.filter(
                F.transform(toks, lambda x: F.lower(x)),
                lambda x: x.isin(*GOPHER_STOPWORDS),
            )
        )
    )

    return df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_words"),
        ((n >= min_words) & (n <= max_words)).alias("gate_words"),
        (
            (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        ).alias("gate_word_len"),
        (symbol_ratio <= max_symbol_word_ratio).alias("gate_symbols"),
        (bullet_frac <= max_bullet_line_frac).alias("gate_bullets"),
        (ellipsis_frac <= max_ellipsis_line_frac).alias("gate_ellipsis"),
        (alpha_frac >= min_alpha_word_frac).alias("gate_alpha"),
        (stop_hits >= min_stop_hits).alias("gate_stopwords"),
    ).withColumn(
        "passes",
        F.col("gate_words")
        & F.col("gate_word_len")
        & F.col("gate_symbols")
        & F.col("gate_bullets")
        & F.col("gate_ellipsis")
        & F.col("gate_alpha")
        & F.col("gate_stopwords"),
    )


def quantile_gate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    boundaries: list[str],
    q: float = 0.99,
    state: DataFrame | None = None,
) -> DataFrame:
    """Drop rows whose ``value_col`` exceeds the per-group qth-quantile
    estimate — the data-driven outlier gate (per-source length caps,
    latency trims) that replaces hand-tuned constants. Thresholds come
    from the mergeable histogram state (``sketches.value_histogram``):
    pass the MAINTAINED ``state`` in production so the gate never rescans
    the corpus to learn its cutoffs; omitted, it builds the state from
    ``df`` in one extra aggregation.

    The estimate is a bin UPPER edge, so the gate keeps every row of the
    quantile's bin (conservative — it over-keeps by at most one bin ratio,
    never over-drops). A NULL estimate (quantile beyond the grid) keeps
    the whole group: an undersized grid degrades to a no-op, not a silent
    purge. Thresholds are groups-sized — the join broadcasts."""
    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.operators.sketches import (
        quantiles_from_histogram,
        value_histogram,
    )

    if state is None:
        state = value_histogram(df, group_cols, value_col, boundaries)
    thr = quantiles_from_histogram(
        state, group_cols, boundaries, qs=(q,)
    ).select(*group_cols, F.col("est").alias("__thr"))
    val = round_half_up(F.col(value_col).cast("double"), 6)
    # NULL values pass: they do not exceed any threshold (and the state
    # that learned the threshold excluded them) — a gate must not purge
    # rows it never measured
    return (
        df.join(F.broadcast(thr), group_cols, "left")
        .filter(
            F.col("__thr").isNull()
            | F.col(value_col).isNull()
            | (val <= F.col("__thr"))
        )
        .drop("__thr")
    )
