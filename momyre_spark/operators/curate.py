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
