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


def repetition_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_ns: tuple[int, ...] = (2, 3, 4),
) -> DataFrame:
    """Gopher/MassiveText REPETITION metrics — the half of the published
    quality battery :func:`gopher_gates` doesn't cover: within-document
    duplicate lines/paragraphs and the top-n-gram character fraction, the
    signals that catch boilerplate-looping and keyword-stuffed pages.

    Per document:

    - ``dup_line_frac``   : (lines − distinct lines) / lines
    - ``dup_line_char_frac``: characters in lines occurring ≥2 times (all
      occurrences) / characters across all lines
    - ``dup_para_frac`` / ``dup_para_char_frac``: same over ``\\n\\n``
      paragraphs
    - ``top{n}_frac``     : occurrences(most frequent word n-gram) ×
      len(n-gram) / len(space-joined token stream), per requested n

    Lines/paragraphs are the non-blank ``\\n`` / ``\\n\\n`` splits; n-grams
    are space-joined word windows. Ratios are round-half-up to 6 dp with
    integer numerators, so a SQL oracle reproduces every bit.

    Shape: TWO tagged explodes + hash-aggs total — lines and paragraphs
    share one (doc, kind, unit)-keyed pass, all requested n share one
    (doc, n, gram)-keyed pass — so the corpus is scanned twice, not once
    per surface. Per-key state is one count, the per-doc rollups are
    tiny and co-partition into the final joins. No window over the
    corpus, no UDF; empty docs surface NULL fractions, never a
    fabricated 0."""
    from momyre_spark.functions.numeric import round_half_up
    from momyre_spark.functions.text import tokens

    from momyre_spark.operators.parallelism import ensure_parallelism

    t = F.col(text_col)
    nonblank = lambda arr: F.filter(  # noqa: E731
        arr, lambda x: F.trim(x) != ""
    )
    # the tagged explodes below are the dominant map cost: a single-file
    # corpus layout must not serialize them on one core
    df = ensure_parallelism(df)
    base = df.select(
        F.col(id_col),
        nonblank(F.split(t, "\n")).alias("__lines"),
        nonblank(F.split(t, "\n\n")).alias("__paras"),
        tokens(t).alias("__toks"),
    )

    # lines AND paragraphs in ONE tagged explode (the same fusion the
    # n-gram surface below uses): one corpus scan + one (doc, kind, unit)
    # shuffle instead of one of each per surface. Conditional sums carry
    # NO otherwise(0): a doc absent from a kind must read NULL (matching
    # the old per-surface left joins), never a fabricated 0/0.
    units = base.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.transform(
                    "__lines",
                    lambda u: F.struct(F.lit("l").alias("k"), u.alias("u")),
                ),
                F.transform(
                    "__paras",
                    lambda u: F.struct(F.lit("p").alias("k"), u.alias("u")),
                ),
            )
        ).alias("ku"),
    ).select(id_col, F.col("ku.k").alias("k"), F.col("ku.u").alias("u"))
    per_unit = (
        units.groupBy(id_col, "k", "u")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("ln", F.length("u"))
    )

    def _kind(prefix: str):
        cond = F.col("k") == prefix
        return [
            F.sum(F.when(cond, F.col("c"))).cast("bigint").alias(f"__{prefix}_n"),
            F.count(F.when(cond, F.lit(1))).cast("bigint").alias(
                f"__{prefix}_distinct"
            ),
            F.sum(F.when(cond, F.col("c") * F.col("ln")))
            .cast("bigint")
            .alias(f"__{prefix}_chars"),
            F.sum(
                F.when(cond & (F.col("c") > 1), F.col("c") * F.col("ln"))
                .otherwise(F.when(cond, F.lit(0)))
            ).cast("bigint").alias(f"__{prefix}_dup_chars"),
        ]

    unit_rollup = per_unit.groupBy(id_col).agg(*_kind("l"), *_kind("p"))

    # all requested n in ONE tagged explode: gram rows carry their n.
    # n is bound via a factory, NOT a lambda default arg — a 2-parameter
    # lambda makes F.transform pass (element, index) and the "n" silently
    # becomes the position column.
    def _gram_array(n: int):
        return F.when(
            F.size("__toks") >= n,
            F.transform(
                F.sequence(F.lit(0), F.size("__toks") - n),
                lambda j: F.struct(
                    F.lit(n).alias("n"),
                    F.concat_ws(" ", F.slice("__toks", j + 1, n)).alias("g"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))

    gram_arrays = [_gram_array(n) for n in ngram_ns]
    ng = base.select(
        id_col,
        F.length(F.concat_ws(" ", "__toks")).cast("bigint").alias("__tok_chars"),
        F.explode(F.flatten(F.array(*gram_arrays))).alias("gr"),
    )
    per_gram = ng.groupBy(
        id_col, "__tok_chars", F.col("gr.n").alias("n"), F.col("gr.g").alias("g")
    ).agg(F.count(F.lit(1)).alias("c"))
    top = per_gram.groupBy(id_col, "__tok_chars").agg(
        *[
            F.max(
                F.when(F.col("n") == n, F.col("c") * F.length("g"))
            ).cast("bigint").alias(f"__top{n}_chars")
            for n in ngram_ns
        ]
    )

    out = (
        base.select(id_col)
        .join(unit_rollup, id_col, "left")
        .join(top, id_col, "left")
    )
    r6 = lambda num, den: round_half_up(  # noqa: E731
        num.cast("double") / den.cast("double"), 6
    )
    return out.select(
        id_col,
        F.coalesce(F.col("__l_n"), F.lit(0)).cast("bigint").alias("n_lines"),
        r6(F.col("__l_n") - F.col("__l_distinct"), F.col("__l_n")).alias(
            "dup_line_frac"
        ),
        r6(F.col("__l_dup_chars"), F.col("__l_chars")).alias(
            "dup_line_char_frac"
        ),
        r6(F.col("__p_n") - F.col("__p_distinct"), F.col("__p_n")).alias(
            "dup_para_frac"
        ),
        r6(F.col("__p_dup_chars"), F.col("__p_chars")).alias(
            "dup_para_char_frac"
        ),
        *[
            r6(F.col(f"__top{n}_chars"), F.col("__tok_chars")).alias(
                f"top{n}_frac"
            )
            for n in ngram_ns
        ],
    )


def domain_quality_report(
    docs: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    key: str = "exact",
    min_docs: int = 5,
    max_dup_frac: float = 0.5,
    min_alpha_frac: float = 0.6,
    min_mean_tokens: float = 20.0,
    digits: int = 6,
) -> DataFrame:
    """Per-domain quality aggregation + blocklist verdict — the
    RefinedWeb/C4 curation move of gating whole HOSTS, not documents:
    a domain whose pages are mostly duplicates or mostly non-alphabetic
    is spam/boilerplate farm territory, and cutting it at the domain
    level is both cheaper (one list lookup at ingest) and safer (no
    per-page threshold noise) than re-scoring every page. Output one
    row per domain: ``(domain, n_docs, n_dup_docs, dup_frac,
    alpha_frac, mean_tokens, blocked)`` with ``blocked`` true when any
    gate trips (too-duplicated, too-non-alphabetic, too-short) for a
    domain with at least ``min_docs`` pages (smaller domains lack the
    evidence to block).

    Spark-first shape: one exact-dup fingerprint groupBy (the
    dedup_exact exchange — map-side partial agg) joined back for the
    per-doc duplicate verdict, then ONE domain-keyed hash agg of pure
    integer sums; every ratio is a single division of two exact BIGINTs
    at the domain level, never an average of per-doc floats (averaging
    doubles is summation-order-dependent; summing ints is not).
    Domains are low-cardinality next to the corpus, so the final agg
    collapses map-side and a hot domain is partial-agg-safe.

    ``key`` picks the duplicate granularity — ``'exact'``
    (whitespace/case-normalized) or ``'bow'`` (order-insensitive
    bag-of-words, catching shuffled re-hostings) — the same convention
    as cluster_weighted_sample and the incremental-dedup state.
    """
    from momyre_spark.functions.text import (
        content_fingerprint,
        fingerprint,
        tokens,
    )

    if key == "exact":
        fp = fingerprint(F.col(text_col))
    elif key == "bow":
        fp = content_fingerprint(F.col(text_col))
    else:
        raise ValueError("momyre: key must be 'exact' or 'bow'")
    keyed = docs.select(
        F.col(id_col).alias("__id"),
        F.col(domain_col).alias("domain"),
        fp.alias("__fp"),
        F.length(F.col(text_col)).cast("bigint").alias("__chars"),
        F.length(
            F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")
        ).cast("bigint").alias("__alpha"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("__toks"),
    )
    sizes = keyed.groupBy("__fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_copies")
    )
    enriched = keyed.join(sizes, "__fp")
    agg = enriched.groupBy("domain").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("__n_copies") > 1).cast("int"))
        .cast("bigint")
        .alias("n_dup_docs"),
        F.sum("__chars").cast("bigint").alias("__sum_chars"),
        F.sum("__alpha").cast("bigint").alias("__sum_alpha"),
        F.sum("__toks").cast("bigint").alias("__sum_toks"),
    )
    from momyre_spark.functions.numeric import round_half_up

    dup_frac = F.col("n_dup_docs").cast("double") / F.col("n_docs").cast(
        "double"
    )
    alpha_frac = F.col("__sum_alpha").cast("double") / F.col(
        "__sum_chars"
    ).cast("double")
    mean_tokens = F.col("__sum_toks").cast("double") / F.col("n_docs").cast(
        "double"
    )
    blocked = (F.col("n_docs") >= F.lit(int(min_docs))) & (
        (dup_frac > F.lit(float(max_dup_frac)))
        | (alpha_frac < F.lit(float(min_alpha_frac)))
        | (mean_tokens < F.lit(float(min_mean_tokens)))
    )
    return agg.select(
        "domain",
        "n_docs",
        "n_dup_docs",
        round_half_up(dup_frac, digits).alias("dup_frac"),
        round_half_up(alpha_frac, digits).alias("alpha_frac"),
        round_half_up(mean_tokens, digits).alias("mean_tokens"),
        blocked.alias("blocked"),
    )
