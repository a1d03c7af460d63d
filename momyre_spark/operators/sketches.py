"""Mergeable distinct-count sketches: materialize, merge, estimate.

The 100 TB pattern for maintained NDV stats: a full recount of
count(DISTINCT x) per partition/day/source is a full-corpus shuffle every
time, but a Datasketches HLL sketch is an associative, commutative
aggregate — each ingest batch contributes a small binary sketch, and the
corpus-wide (or any rollup's) distinct count is a cheap union of sketches,
never a re-scan. Spark ships the Apache DataSketches HLL family
(`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), which this
module wraps into a maintained-stats workflow:

    sketches = ndv_sketch_table(batch, ["source"], "doc_id")   # per batch
    total    = merge_ndv_sketches(sketches_over_many_batches, ["source"])

Estimates carry the usual HLL relative error (~1.6% at lgK=12, tunable).
Sketch bytes are engine-specific (no SQL oracle); correctness is pinned by
property tests: estimate-vs-exact tolerance and the merge law
(union of per-partition sketches == sketch of the whole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH_COL = "ndv_sketch"


def ndv_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col`` — the mergeable unit of
    distinct-count state. One hash aggregation; the output is
    ``group_cols + [ndv_sketch BINARY]`` and is small (≤ ~2^lg_k bytes per
    group), safe to persist alongside a snapshot manifest or serving table.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col).cast("string"), F.lit(lg_k)).alias(
            SKETCH_COL
        )
    )


def merge_ndv_sketches(
    sketches: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Union sketch state per group (e.g. many batch-sketch tables unioned
    row-wise, or a finer grouping rolled up to a coarser one). Associative
    and commutative — ingest order never changes the state."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(SKETCH_COL).alias(SKETCH_COL)
    )


def estimate_ndv(sketches: DataFrame) -> DataFrame:
    """Replace the sketch column with its distinct-count estimate."""
    keep = [c for c in sketches.columns if c != SKETCH_COL]
    return sketches.select(
        *keep,
        F.hll_sketch_estimate(SKETCH_COL).cast("bigint").alias("ndv_estimate"),
    )


def sketch_overlap_matrix(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lg_k: int = 14,
) -> DataFrame:
    """ESTIMATED distinct-value overlap between every group pair, with no
    pairwise join of the data — the sketch twin of
    ``dedup.cross_source_overlap`` for corpora too large to equi-join.

    Inclusion–exclusion over HLL sketches:
    ``|A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)``. One hash aggregation
    builds a KB-scale sketch per group; the pair expansion then happens
    over the |groups|-row SKETCH table (all-pairs there is |groups|²/2
    rows of KB payloads — trivial), never over the corpus. Error compounds
    across three estimates (~3·1.6% of the larger set at lgK=14), so small
    overlaps between huge sets read as noise — this is the triage pass
    that decides WHICH source pairs are worth the exact join.

    Returns ``(group_a, group_b, ndv_a, ndv_b, overlap_estimate)`` with
    the overlap clamped at >= 0."""
    sk = ndv_sketch_table(df, [group_col], value_col, lg_k=lg_k)
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col(SKETCH_COL).alias("__ska")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col(SKETCH_COL).alias("__skb")
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    est_a = F.hll_sketch_estimate("__ska")
    est_b = F.hll_sketch_estimate("__skb")
    est_union = F.hll_sketch_estimate(F.hll_union("__ska", "__skb"))
    return pairs.select(
        "group_a",
        "group_b",
        est_a.cast("bigint").alias("ndv_a"),
        est_b.cast("bigint").alias("ndv_b"),
        F.greatest(
            (est_a + est_b - est_union).cast("bigint"), F.lit(0)
        ).alias("overlap_estimate"),
    )
